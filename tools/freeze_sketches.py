#!/usr/bin/env python3
"""Freeze the engine-internal sketch estimates (q14 HLL++ approx distinct,
q51 Greenwald-Khanna approx percentile, q147 DataSketches HLL) as committed
expected tables, flipping the three formerly rows-only queries to full
DuckDB hash-matches — the q101/q99 freeze discipline applied to sketches
(VERDICT r12 #2).

Why freezing is honest here: a cross-engine recomputation of these values
would have to REIMPLEMENT Spark's HLL++ bias tables / GK merge / the
DataSketches HIP estimator inside DuckDB — testing a reimplementation, not
the operator. The estimates are, however, fully DETERMINISTIC for a fixed
fixture (HLL register merge is commutative max; GK is stable under the
fixed scan partitioning — verified run-stable 10/10 including under a
16-way repartition stress), so pinning them is a legitimate regression
check. Crucially the generated oracle freezes ONLY the estimates: the
exact counts, exact percentile brackets and the accuracy-band booleans are
recomputed LIVE in DuckDB, so the committed pin is cross-checked against
the published accuracy contract by the oracle itself, and the in-query
raise_error gates (SF-agnostic) stay in the Spark bodies.

LAYOUT CONTRACT (round 14): ALL pins are now layout-independent. The
HLL pins (q14/q147) always were (commutative register-max merge); the
GK pin (q51) became so when the query started pinning its own layout —
repartition(4) on the group key (each group's sketch built in exactly
one partition, no partial merge) plus a total sortWithinPartitions
(insert order a pure function of the data). FrozenSketchSpec asserts
reproduction under the Verify layout, an alternate session layout, AND
an adversarially repartitioned input. Regenerate with one run of this
script against a fresh dump only after a deliberate recipe change.

Usage: python3 tools/freeze_sketches.py [verify_out_dir]
  verify_out_dir defaults to /tmp/verify_out — a fresh
  `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"` dump.
Writes src/main/scala/graft/queries/FrozenSketchSql.scala.
"""
import sys
import duckdb

OUT = "src/main/scala/graft/queries/FrozenSketchSql.scala"


def rows(d, name, cols):
    return duckdb.sql(
        f"SELECT {', '.join(cols)} FROM parquet_scan('{d}/{name}/*.parquet')"
        f" ORDER BY 1").fetchall()


def values(rws):
    def lit(v):
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return repr(v)
    return ",\n         ".join("(" + ", ".join(lit(v) for v in r) + ")"
                               for r in rws)


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"

    q14 = values(rows(d, "q14_approx_distinct",
                      ["o_orderpriority", "approx_customers"]))
    q51 = values(rows(d, "q51_approx_percentile",
                      ["l_returnflag", "l_quantity_p50_approx",
                       "l_quantity_p90_approx",
                       "l_extendedprice_p25_approx"]))
    q147 = values(rows(d, "q147_hll_distinct_sketch",
                       ["source", "est_whole", "est_merged"]))

    scala = f'''package graft.queries

/** GENERATED FILE -- regenerate with `python3 tools/freeze_sketches.py`
  * after a fresh `graft.Verify` dump (see the script docstring for the
  * freeze-the-estimate rationale). Only the sketch ESTIMATES are frozen
  * VALUES; every exact count, exact-percentile bracket and accuracy-band
  * boolean is recomputed live by DuckDB, so the pin is cross-checked
  * against the published accuracy contract inside the oracle itself.
  */
object FrozenSketchSql {{

  /** q14: frozen HLL++ estimates; exact distinct + the 4*rsd(0.05)=20%
    * band recomputed live.
    */
  val q14: String = """WITH frozen AS (
         SELECT * FROM (VALUES
         {q14}
       ) AS t(o_orderpriority, approx_customers)),
       exact AS (SELECT o_orderpriority,
                        count(DISTINCT o_custkey) AS exact_customers
                 FROM orders GROUP BY 1)
       SELECT f.o_orderpriority,
              CAST(f.approx_customers AS BIGINT) AS approx_customers,
              CAST(e.exact_customers AS BIGINT) AS exact_customers,
              abs(CAST(f.approx_customers AS DOUBLE) - e.exact_customers)
                <= 0.2 * e.exact_customers AS within_bound
       FROM frozen f JOIN exact e USING (o_orderpriority)
       ORDER BY o_orderpriority"""

  /** q51: frozen GK estimates; the exact-percentile brackets at
    * q +- 0.005 (5x the rank-error guarantee at accuracy 1000) and the
    * in-bracket booleans recomputed live via quantile_cont.
    */
  val q51: String = """WITH frozen AS (
         SELECT * FROM (VALUES
         {q51}
       ) AS t(l_returnflag, p50, p90, p25)),
       ex AS (SELECT l_returnflag,
                     quantile_cont(l_quantity, 0.495) AS q50lo,
                     quantile_cont(l_quantity, 0.505) AS q50hi,
                     quantile_cont(l_quantity, 0.895) AS q90lo,
                     quantile_cont(l_quantity, 0.905) AS q90hi,
                     quantile_cont(l_extendedprice, 0.245) AS p25lo,
                     quantile_cont(l_extendedprice, 0.255) AS p25hi
              FROM lineitem GROUP BY 1)
       SELECT f.l_returnflag,
              CAST(f.p50 AS DOUBLE) AS l_quantity_p50_approx,
              f.p50 BETWEEN e.q50lo AND e.q50hi AS l_quantity_p50_ok,
              CAST(f.p90 AS DOUBLE) AS l_quantity_p90_approx,
              f.p90 BETWEEN e.q90lo AND e.q90hi AS l_quantity_p90_ok,
              CAST(f.p25 AS DOUBLE) AS l_extendedprice_p25_approx,
              f.p25 BETWEEN e.p25lo AND e.p25hi AS l_extendedprice_p25_ok
       FROM frozen f JOIN ex e USING (l_returnflag)
       ORDER BY l_returnflag"""

  /** q147: frozen DataSketches HLL estimates (one-shot + two-batch
    * union); the exact (doc, term) incidence count recomputed live with
    * the same tokenization, anchored on the source dimension.
    */
  val q147: String = """WITH items AS (
         SELECT source, CAST(doc_id AS VARCHAR) || ':' || term AS item
         FROM (SELECT source, doc_id,
                      unnest(regexp_split_to_array(trim(lower(text)),
                                                   '[\\s\\x0B]+')) AS term
               FROM documents)
         WHERE term <> ''),
       exact AS (SELECT source, count(DISTINCT item) AS n_exact
                 FROM items GROUP BY 1),
       srcs AS (SELECT DISTINCT source FROM documents),
       frozen AS (
         SELECT * FROM (VALUES
         {q147}
       ) AS t(source, est_whole, est_merged))
       SELECT s.source,
              CAST(coalesce(e.n_exact, 0) AS BIGINT) AS n_exact,
              CAST(f.est_whole AS BIGINT) AS est_whole,
              CAST(f.est_merged AS BIGINT) AS est_merged
       FROM srcs s
       LEFT JOIN exact e USING (source)
       JOIN frozen f USING (source)
       ORDER BY source"""
}}
'''
    with open(OUT, "w") as f:
        f.write(scala)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
