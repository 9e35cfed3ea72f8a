package graft.queries

import graft.operators.FrozenClassifier

/** DuckDB twin for q99 (round 12) — quality-classifier scoring with the
  * FROZEN quantized model ([[graft.operators.FrozenClassifier]], the
  * committed q99 training artifact, drift-gated in-query and by
  * `FrozenClassifierSpec`): the hashing-trick featurizer is Scala's
  * `MurmurHash3.stringHash(token, 0x9747b28c) mod 2048` — replayed by
  * the same recursive-CTE murmur pipeline the q33/q34/q98 promotions
  * validated token-for-token against the JVM — and the margin is an
  * exact BIGINT sum `bias_q + Σ w_q(fid)` over each doc's DISTINCT
  * feature ids (binary presence features), so both engines compute
  * bit-identical integers and the only libm call left is one `exp`
  * in the sigmoid. Scores round to 6 on both engines; a committed
  * audit (`FreezeClassifierWeights` stderr, re-pinned in
  * `FrozenClassifierSpec`) shows the nearest `p·10^6` sits 6.2e-3
  * units from a .5 rounding boundary at sf0.01 — ~7 orders of
  * magnitude above cross-engine `exp` ulps, so the rounding cannot
  * diverge. A drifted featurizer, a wrong hash seed, a dropped
  * feature or a broken sigmoid Spark-side all change its hashes and
  * fail the driver's compare.
  *
  * The oracle weights are interpolated from the SAME literals the
  * Spark query applies, so query and oracle cannot drift.
  */
object ClassifierSql {

  val quantizedScores: String = {
    val wRows = FrozenClassifier.oracleWeights
      .map { case (i, q) => s"($i, ${q}::BIGINT)" }
      .mkString(",\n           ")
    // Scala's Int seed 0x9747b28c, in the unsigned-32 representation
    // the murmur CTE's mod-2^32 arithmetic uses throughout.
    val seedU = 0x9747b28cL & 0xffffffffL
    s"""WITH RECURSIVE
       toks AS (SELECT doc_id,
                       unnest(regexp_split_to_array(trim(text), '[\\s\\x0B]+')) AS w
                FROM documents),
       t2 AS (SELECT doc_id, w FROM toks WHERE w <> ''),
       dw(w) AS (SELECT DISTINCT w FROM t2),
       seeds(seed) AS (VALUES (${seedU}::BIGINT)),
       ${HashSql.murmurCtes},
       fid AS (SELECT w,
                      ((((CASE WHEN hash >= 2147483648
                               THEN hash - 4294967296 ELSE hash END)
                         % ${FrozenClassifier.Dim})
                        + ${FrozenClassifier.Dim})
                       % ${FrozenClassifier.Dim}) AS fid
               FROM wh),
       df AS (SELECT DISTINCT t2.doc_id, fid.fid
              FROM t2 JOIN fid USING (w)),
       wq(fid, q) AS (
         SELECT * FROM (VALUES
           $wRows)),
       contrib AS (SELECT df.doc_id, sum(w.q) AS s
                   FROM df JOIN wq w ON w.fid = df.fid
                   GROUP BY 1),
       marg AS (SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.text,
                       ${FrozenClassifier.oracleBias}::BIGINT
                         + CAST(COALESCE(c.s, 0) AS BIGINT) AS zq
                FROM documents d
                LEFT JOIN contrib c ON c.doc_id = d.doc_id)
       SELECT doc_id,
              round(1.0 / (1.0 + exp(-(CAST(zq AS DOUBLE)
                                       / ${FrozenClassifier.Scale}.0))),
                    6) AS p,
              CAST(CASE WHEN list_contains(
                     regexp_split_to_array(trim(text), '[\\s\\x0B]+'), 'spark')
                   THEN 1 ELSE 0 END AS DOUBLE) AS label
       FROM marg
       ORDER BY doc_id"""
  }
}
