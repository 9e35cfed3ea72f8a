#!/usr/bin/env python3
"""Adjudicate per-query bench numbers against prior-round officials.

Usage: python3 tools/adjudicate_bench.py [bench.json]

Reads the given bench JSON line (default: bench.json, the median-of-N
format), plus BENCH_r03.json (the operative BASELINE.md round) and
BENCH_r05.json (the last pre-variance-fix officials), and prints a
per-query ratio table for the round-7 weak set plus any entry >2x
either prior round — the evidence the round-7 verdict asked for to
adjudicate the q45/q49-q58 band with repetition-based numbers.
"""
import json
import sys


def load_official(path):
    """Official BENCH_r{N}.json files wrap the bench line; the builder's
    bench.json IS the line. Handle both, plus truncated `tail` wrappers."""
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d["queries"]
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]["queries"]
    # fall back: regex over the (possibly truncated) tail — cut at the
    # errors/regressions maps, whose entries reuse query names with
    # RATIO values and would overwrite the real seconds
    import re
    tail = d.get("tail", "")
    for stop in ('"errors"', '"regressions"', '"spread"'):
        i = tail.find(stop)
        if i >= 0:
            tail = tail[:i]
    qs = {}
    for m in re.finditer(r'"(q\d+[A-Za-z0-9_]*|dirt_[A-Za-z0-9_]*|dedup_[A-Za-z0-9_]*)":([0-9.eE+-]+)', tail):
        try:
            qs[m.group(1)] = float(m.group(2))
        except ValueError:
            pass
    return qs


WEAK_R7 = ["q45_dedup_embedding_exact", "q49_sql_subqueries", "q50_udaf_topk",
           "q51_approx_percentile", "q54_curation_hash_split",
           "q55_curation_pack_bins", "q56_stream_interval_join",
           "q57_orc_roundtrip", "q58_json_roundtrip"]


def main(path="bench.json"):
    cur = json.load(open(path))
    med = cur["queries"]
    spread = cur.get("spread", {})
    r3 = load_official("BENCH_r03.json")
    r5 = load_official("BENCH_r05.json")

    def row(q):
        m = med.get(q)
        if m is None:
            return None
        s = spread.get(q, [m, m])
        v3, v5 = r3.get(q), r5.get(q)
        return (q, m, s[0], s[1],
                m / v3 if v3 else None, m / v5 if v5 else None)

    print(f"{'query':38} {'median':>7} {'min':>7} {'max':>7} {'vs_r3':>6} {'vs_r5':>6}")
    flagged = []
    for q in sorted(med):
        r = row(q)
        if r is None:
            continue
        q_, m, lo, hi, x3, x5 = r
        bad = (x3 and x3 > 2.0) or (x5 and x5 > 2.0)
        mark = " <-- weak(r7)" if q in WEAK_R7 else ""
        if q in WEAK_R7 or bad:
            flagged.append((q_, bad))
            print(f"{q_:38} {m:7.2f} {lo:7.2f} {hi:7.2f} "
                  f"{x3 or float('nan'):6.2f} {x5 or float('nan'):6.2f}"
                  f"{' **OVER 2x**' if bad else ''}{mark}")
    over = [q for q, bad in flagged if bad]
    m3 = [(m, r3[q]) for q, m in med.items() if q in r3]
    m5 = [(m, r5[q]) for q, m in med.items() if q in r5]
    print(f"\nmatched-total vs r3: {sum(a for a, _ in m3):.1f}s / "
          f"{sum(b for _, b in m3):.1f}s = "
          f"{sum(a for a, _ in m3) / sum(b for _, b in m3):.2f}x "
          f"({len(m3)} queries)")
    print(f"matched-total vs r5: {sum(a for a, _ in m5):.1f}s / "
          f"{sum(b for _, b in m5):.1f}s = "
          f"{sum(a for a, _ in m5) / sum(b for _, b in m5):.2f}x "
          f"({len(m5)} queries)")
    print(f"\nentries over 2x a prior round: {over or 'NONE'}")


if __name__ == "__main__":
    main(*sys.argv[1:])
