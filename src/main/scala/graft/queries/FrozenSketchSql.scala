package graft.queries

/** GENERATED FILE -- regenerate with `python3 tools/freeze_sketches.py`
  * after a fresh `graft.Verify` dump (see the script docstring for the
  * freeze-the-estimate rationale). Only the sketch ESTIMATES are frozen
  * VALUES; every exact count, exact-percentile bracket and accuracy-band
  * boolean is recomputed live by DuckDB, so the pin is cross-checked
  * against the published accuracy contract inside the oracle itself.
  */
object FrozenSketchSql {

  /** q14: frozen HLL++ estimates; exact distinct + the 4*rsd(0.05)=20%
    * band recomputed live.
    */
  val q14: String = """WITH frozen AS (
         SELECT * FROM (VALUES
         ('1-URGENT', 1171),
         ('2-HIGH', 1268),
         ('3-MEDIUM', 1245),
         ('4-NOT SPECIFIED', 1245),
         ('5-LOW', 1257)
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
         ('A', 25.0, 45.0, 26895.83),
         ('N', 26.0, 45.0, 27018.88),
         ('R', 25.0, 45.0, 26825.52)
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
                                                   '[\s\x0B]+')) AS term
               FROM documents)
         WHERE term <> ''),
       exact AS (SELECT source, count(DISTINCT item) AS n_exact
                 FROM items GROUP BY 1),
       srcs AS (SELECT DISTINCT source FROM documents),
       frozen AS (
         SELECT * FROM (VALUES
         ('src0', 615, 614),
         ('src1', 624, 627),
         ('src10', 572, 573),
         ('src11', 649, 646),
         ('src12', 572, 566),
         ('src13', 616, 619),
         ('src14', 571, 568),
         ('src15', 560, 562),
         ('src16', 552, 556),
         ('src17', 595, 596),
         ('src18', 585, 588),
         ('src19', 536, 541),
         ('src2', 592, 599),
         ('src3', 596, 598),
         ('src4', 577, 574),
         ('src5', 577, 576),
         ('src6', 551, 558),
         ('src7', 632, 633),
         ('src8', 532, 535),
         ('src9', 588, 586)
       ) AS t(source, est_whole, est_merged))
       SELECT s.source,
              CAST(coalesce(e.n_exact, 0) AS BIGINT) AS n_exact,
              CAST(f.est_whole AS BIGINT) AS est_whole,
              CAST(f.est_merged AS BIGINT) AS est_merged
       FROM srcs s
       LEFT JOIN exact e USING (source)
       JOIN frozen f USING (source)
       ORDER BY source"""
}
