#!/usr/bin/env python3
"""Regenerate bench_baseline.json from committed quiet-run evidence.

Usage: pin_baseline.py OUT RUN.json [RUN.json ...] \
           [--history OLD_PIN.json ...]

Pin policy (round 18, VERDICT r17 "what's wrong" #2 / next-round #6 —
splitting the two jobs one number used to do):

  - `queries` (THE PIN, whose sum is the total the judge compares run
    totals against) is each entry's MEDIAN across the clean quiet
    runs: the honest typical cost. The previous envelope-max pin let a
    single bimodal outlier inflate the pin total (~27 s of slack from
    one `table_stream_50batches` reading in r17), flattering the
    headline ratio.
  - `flagbase` (THE FLAG BAND, read by Bench.parseFlagBase) is the
    per-entry MAX across the runs — the envelope. Per-entry medians
    whipsaw up to ~2.5x between clean runs of IDENTICAL code
    (committed examples: dirt_lifecycle_200000 at 1.47/3.49/3.90 s
    across runs 10/8/11, q53 at 2.08-3.57 s), so flagging against a
    median would make some normal future run flag a false 2x
    regression (the round-8 'stale-fast baseline' failure). Against
    the envelope, a >2x flag means the query ran slower than TWICE
    ANYTHING a clean run of this code ever produced — a real
    regression or real contention, never baseline staleness.

The pinned spread stays [min of run mins, max of run maxes]. The LAST
run defines the pinned entry set (it is the current code state);
earlier runs contribute values only for entries they share with it, so
a renamed or removed entry can never linger in the pin and silently
inflate the pin total. For every entry pinned, all contributing runs
must come from the same code state of THAT entry; entries absent from
older runs (newly added or resized queries) pin from the runs that
have them.

Top-level fields are recomputed so the file stays internally
consistent (the ADVICE r8 defect): value = sum of pinned entries,
n_ok = len(queries), errors/regressions empty (a pin is a reference
point, not a comparison), provenance recorded in pinned_from.

CROSS-ROUND DRIFT AUDIT (round 17, VERDICT r16 #7): re-pinning every
round from that round's own quiet runs means a genuine sub-2x creep
could RATCHET across rounds -- each round's slightly-slower pin becomes
the next round's baseline and no single round ever flags. Pass the
OLDEST available pins (e.g. `git show <old>:bench_baseline.json`) via
--history: each entry's new pin is diffed against its value in the
EARLIEST history file that contains it, and growth > 1.5x is flagged
loudly and recorded in the pinned file's `drift_audit` field, so the
ratchet is visible at re-pin time and must be explained by a touching
commit (or investigated) rather than silently absorbed.
"""
import json
import statistics
import sys


def main() -> None:
    args = sys.argv[1:]
    history_paths = []
    if "--history" in args:
        i = args.index("--history")
        history_paths = args[i + 1:]
        args = args[:i]
    out, *paths = args
    runs = [json.load(open(p)) for p in paths]
    for p, r in zip(paths, runs):
        if r.get("errors"):
            raise SystemExit(f"{p}: refusing to pin from a run with errors")

    names = sorted(runs[-1]["queries"])
    queries, flagbase, spread = {}, {}, {}
    for q in names:
        vals = [r["queries"][q] for r in runs if q in r["queries"]]
        queries[q] = statistics.median(vals)
        flagbase[q] = max(vals)
        los = [r["spread"][q][0] for r in runs if q in r.get("spread", {})]
        his = [r["spread"][q][1] for r in runs if q in r.get("spread", {})]
        spread[q] = [min(los) if los else queries[q], max(his) if his else flagbase[q]]

    ref = runs[-1]
    pinned = {
        "metric": ref["metric"],
        "value": round(sum(queries.values()), 3),
        "unit": ref["unit"],
        "sf": ref["sf"],
        "reps": ref["reps"],
        "n_ok": len(queries),
        "n_err": 0,
        "queries": {q: round(v, 4) for q, v in queries.items()},
        "flagbase": {q: round(v, 4) for q, v in flagbase.items()},
        "spread": {q: [round(lo, 4), round(hi, 4)] for q, (lo, hi) in spread.items()},
        "errors": {},
        "regressions": {},
        "pinned_from": [p.split("/")[-1] for p in paths],
    }
    if history_paths:
        history = [(p, json.load(open(p))) for p in history_paths]
        drift = {}
        # NOTE: pre-r18 history pins are envelope maxes, so a new MEDIAN
        # compared against them UNDER-reports drift for one transition
        # round; from r18 on, history medians compare like-for-like.
        for q, new_pin in queries.items():
            oldest = next((h["queries"][q] for _, h in history
                           if q in h.get("queries", {})), None)
            if oldest is not None and oldest > 0 and new_pin / oldest > 1.5:
                drift[q] = {"oldest": round(oldest, 4),
                            "new": round(new_pin, 4),
                            "ratio": round(new_pin / oldest, 2)}
        pinned["drift_audit"] = {
            "history": [p.split("/")[-1] for p in history_paths],
            "threshold": 1.5,
            "flagged": drift,
        }
        for q, d in sorted(drift.items()):
            print(f"DRIFT {q}: {d['oldest']} -> {d['new']} s "
                  f"({d['ratio']}x cumulative) -- explain via a touching "
                  "commit or investigate before trusting this pin")
    # Compact single-line form, exactly like Bench's own output line:
    # Bench.parsePrevQueries regex-matches `"queries":{...}` with no
    # whitespace, so a pretty-printed pin would silently disable the guard.
    with open(out, "w") as f:
        json.dump(pinned, f, separators=(",", ":"))
        f.write("\n")
    print(f"pinned {len(queries)} entries -> {out} (total {pinned['value']} s)")


if __name__ == "__main__":
    main()
