#!/usr/bin/env python3
"""sf1-equivalent scale-probe fixture generator (round 12, VERDICT r11
#4): builds a 10x-sf0.1 `documents.parquet` (50,000 docs) and
`customer.parquet` (150,000 rows) whose marginal distributions are
DERIVED from the committed sf0.1 fixture at runtime — same 31-word
vocabulary, same per-language proportions, same empirical
words-per-document histogram, same `src0..src19` sources, same
`Customer#%09d` name format — so the declared heavy family
(q32/q68/q78/q110/q151) runs at 10x its bench scale on data with the
same density structure (including the fixture family's dense
near-dup blocks, which make pair-producing operators' OUTPUT quadratic
in corpus size — see bench_sf1_spotcheck.json notes).

Deterministic: seeded PRNG (42), distributions read from the read-only
fixture. Output goes OUTSIDE the repo (default /tmp/graft_sf1) — the
probe fixture is ~15 MB of derivable data, so the committed artifact is
this script plus the evidence JSON, not the parquet.

Usage: python3 tools/gen_sf1.py [out_dir]
"""
import random
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
N_DOCS = 50_000
N_CUST = 150_000
SEED = 42


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
    import os
    os.makedirs(out, exist_ok=True)
    rng = random.Random(SEED)
    con = duckdb.connect()

    # --- documents: empirical marginals from the sf0.1 fixture ---
    vocab = [w for (w,) in con.execute(
        "SELECT DISTINCT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w "
        f"FROM '{SRC}/documents.parquet' ORDER BY 1").fetchall() if w]
    langs = con.execute(
        "SELECT lang, count(*) FROM "
        f"'{SRC}/documents.parquet' GROUP BY 1 ORDER BY 1").fetchall()
    lang_names = [l for l, _ in langs]
    lang_weights = [c for _, c in langs]
    sources = [s for (s,) in con.execute(
        f"SELECT DISTINCT source FROM '{SRC}/documents.parquet' ORDER BY 1"
    ).fetchall()]
    wc_hist = con.execute(
        "SELECT len(regexp_split_to_array(trim(text), '\\s+')) AS wc, count(*) "
        f"FROM '{SRC}/documents.parquet' GROUP BY 1 ORDER BY 1").fetchall()
    wc_vals = [w for w, _ in wc_hist]
    wc_weights = [c for _, c in wc_hist]

    seen = set()
    doc_ids, texts, doc_langs, doc_sources, n_chars = [], [], [], [], []
    for i in range(N_DOCS):
        while True:
            wc = rng.choices(wc_vals, wc_weights)[0]
            text = " ".join(rng.choice(vocab) for _ in range(wc))
            if text not in seen:  # fixture guarantees no exact dups
                seen.add(text)
                break
        doc_ids.append(i)
        texts.append(text)
        doc_langs.append(rng.choices(lang_names, lang_weights)[0])
        doc_sources.append(sources[i % len(sources)])
        n_chars.append(len(text))
    pq.write_table(pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(doc_langs, pa.string()),
        "source": pa.array(doc_sources, pa.string()),
        "n_chars": pa.array(n_chars, pa.int64()),
    }), f"{out}/documents.parquet")

    # --- customer: same schema/name format, 10x rows ---
    segs = [s for (s,) in con.execute(
        f"SELECT DISTINCT c_mktsegment FROM '{SRC}/customer.parquet' ORDER BY 1"
    ).fetchall()]
    n_nations = con.execute(
        f"SELECT count(DISTINCT c_nationkey) FROM '{SRC}/customer.parquet'"
    ).fetchone()[0]
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(N_CUST), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(N_CUST)],
                           pa.string()),
        "c_nationkey": pa.array([rng.randrange(n_nations)
                                 for _ in range(N_CUST)], pa.int32()),
        "c_acctbal": pa.array([round(rng.uniform(-999.99, 9999.99), 2)
                               for _ in range(N_CUST)], pa.float64()),
        "c_mktsegment": pa.array([rng.choice(segs) for _ in range(N_CUST)],
                                 pa.string()),
    }), f"{out}/customer.parquet")
    # --- orders: 10x rows, same schema/value shapes (round 14: the
    # table-format scale probes q163/q166 read orders/events) ---
    n_orders = 1_500_000
    statuses = [s for (s,) in con.execute(
        f"SELECT DISTINCT o_orderstatus FROM '{SRC}/orders.parquet' ORDER BY 1"
    ).fetchall()]
    prios = [p for (p,) in con.execute(
        f"SELECT DISTINCT o_orderpriority FROM '{SRC}/orders.parquet' ORDER BY 1"
    ).fetchall()]
    base_us = 820_454_400_000_000  # 1996-01-01 UTC in microseconds
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(n_orders), pa.int64()),
        "o_custkey": pa.array([rng.randrange(N_CUST)
                               for _ in range(n_orders)], pa.int64()),
        "o_orderstatus": pa.array([statuses[i % len(statuses)]
                                   for i in range(n_orders)], pa.string()),
        "o_totalprice": pa.array([round(rng.uniform(900.0, 600000.0), 2)
                                  for _ in range(n_orders)], pa.float64()),
        "o_orderdate": pa.array([base_us + (i % 2557) * 86_400_000_000
                                 for i in range(n_orders)],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array([prios[i % len(prios)]
                                     for i in range(n_orders)], pa.string()),
    }), f"{out}/orders.parquet")

    # --- events: 10x rows, same schema ---
    n_events = 1_000_000
    etypes = [t for (t,) in con.execute(
        f"SELECT DISTINCT event_type FROM '{SRC}/events.parquet' ORDER BY 1"
    ).fetchall()]
    pq.write_table(pa.table({
        "event_id": pa.array(range(n_events), pa.int64()),
        "ts": pa.array([base_us + i * 1_000_000 for i in range(n_events)],
                       pa.timestamp("us")),
        "user_id": pa.array([rng.randrange(N_CUST)
                             for _ in range(n_events)], pa.int64()),
        "event_type": pa.array([etypes[i % len(etypes)]
                                for i in range(n_events)], pa.string()),
        "value": pa.array([round(rng.uniform(0.0, 100.0), 4)
                           for _ in range(n_events)], pa.float64()),
        "props": pa.array(['{"k":%d}' % (i % 7) for i in range(n_events)],
                          pa.string()),
    }), f"{out}/events.parquet")

    print(f"wrote {out}: documents={N_DOCS} customer={N_CUST} "
          f"orders={n_orders} events={n_events} "
          f"(vocab={len(vocab)}, langs={lang_names})")


if __name__ == "__main__":
    main()
