package graft.queries

import graft.operators.FrozenCentroids

/** DuckDB twins for the frozen-quantizer vector family (round 12,
  * VERDICT r11 #2): with the k-means artifacts frozen as committed
  * literals (the sf0.01 entries of [[graft.operators.FrozenCentroids]], drift-gated by
  * `FrozenCentroidsSpec`), cell assignment, probing, PQ encoding, ADC
  * scoring and exact re-ranking are all deterministic relational
  * algebra both engines can replay — so IVF search (q44), PQ/ADC search
  * (q85), SemDeDup pairing (q86) and drop (q108), IVF-PQ (q109) and
  * diversity sampling (q137) graduate from rows-only to full DuckDB
  * hash-matches, the same promotion q114/q148/q150 got from
  * `FrozenVocab`.
  *
  * Cross-engine conventions, shared with the q35 exact-search oracle:
  * every score is `round(x, 6)` (HALF_UP — `VectorSearch.round6` on the
  * Spark side, DuckDB `round`) BEFORE any ranking/thresholding, and
  * every ranking breaks ties by ascending id, so selection is a total
  * order identical on both engines. Distances compare bit-for-bit:
  * both engines upcast the float32 embedding elementwise to double and
  * accumulate in double (`list_distance` / the sqDist loops), and the
  * centroid literals parse to identical IEEE-754 bit patterns.
  *
  * The SQL is generated from the SAME literals the Spark queries apply,
  * so query and oracle cannot drift.
  */
object AnnSql {

  private def sqlVec(v: Vector[Double]): String =
    v.map(_.toString).mkString("[", ", ", "]") + "::DOUBLE[]"

  /** VALUES table of the 16 frozen coarse centroids: cents(cell, cvec). */
  private val centsCte: String =
    "cents(cell, cvec) AS (\n         SELECT * FROM (VALUES\n" +
      FrozenCentroids.oracleCoarse16.zipWithIndex
        .map { case (c, i) => s"           ($i, ${sqlVec(c)})" }
        .mkString(",\n") +
      "))"

  /** VALUES table of the 8×16 frozen PQ codebooks: cb(j, code, cvec). */
  private val cbCte: String =
    "cb(j, code, cvec) AS (\n         SELECT * FROM (VALUES\n" +
      (for {
        (sub, j) <- FrozenCentroids.oraclePqCodebooks.zipWithIndex
        (c, code) <- sub.zipWithIndex
      } yield s"           ($j, $code, ${sqlVec(c)})")
        .mkString(",\n") +
      "))"

  /** Embeddings upcast to DOUBLE[] once, plus the frozen-cell
    * assignment (argmin distance, ties to the lower cell — the
    * `Ivf.nearestCell` order).
    */
  private val assignCtes: String =
    s"""$centsCte,
       e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       assign AS (
         SELECT vec_id, v, cell FROM (
           SELECT e.vec_id, e.v, c.cell,
                  row_number() OVER (PARTITION BY e.vec_id
                                     ORDER BY list_distance(e.v, c.cvec), c.cell)
                    AS rn
           FROM e CROSS JOIN cents c)
         WHERE rn = 1)"""

  /** The 6 probed cells per query vector (ascending distance, ties to
    * the lower cell — the `Ivf.probes` order), queries 0..9.
    */
  private val probesCte: String =
    """probes AS (
         SELECT query_id, qv, cell FROM (
           SELECT q.vec_id AS query_id, q.v AS qv, c.cell,
                  row_number() OVER (PARTITION BY q.vec_id
                                     ORDER BY list_distance(q.v, c.cvec), c.cell)
                    AS rn
           FROM e q CROSS JOIN cents c
           WHERE q.vec_id IN (0,1,2,3,4,5,6,7,8,9))
         WHERE rn <= 6)"""

  /** q44: IVF top-5 — candidates from the 6 probed cells, exact rounded
    * cosine, (cos_sim DESC, neighbor_id) top-5 per query.
    */
  val ivfTopK: String =
    s"""WITH $assignCtes,
       $probesCte,
       scored AS (
         SELECT p.query_id, a.vec_id AS neighbor_id,
                round(list_cosine_similarity(a.v, p.qv), 6) AS cos_sim
         FROM probes p JOIN assign a ON a.cell = p.cell
         WHERE a.vec_id <> p.query_id)
       SELECT query_id, neighbor_id, cos_sim, rank FROM (
         SELECT query_id, neighbor_id, cos_sim,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
         FROM scored)
       WHERE rank <= 5
       ORDER BY query_id, neighbor_id"""

  /** Within-cluster pair scoring shared by q86/q108: both members in the
    * same frozen cell, rounded cosine >= 0.4.
    */
  private val kmeansPairsCte: String =
    """pairs AS (
         SELECT id1, id2, cos_sim FROM (
           SELECT a.vec_id AS id1, b.vec_id AS id2,
                  round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
           FROM assign a JOIN assign b
             ON a.cell = b.cell AND a.vec_id < b.vec_id)
         WHERE cos_sim >= 0.4)"""

  /** q86: SemDeDup pair list (id1, id2, cos_sim). */
  val kmeansPairs: String =
    s"""WITH $assignCtes,
       $kmeansPairsCte
       SELECT id1, id2, cos_sim FROM pairs ORDER BY id1, id2"""

  /** q108: SemDeDup end-to-end — the q86 pairs fed through the same
    * recursive-CTE transitive closure + min-id keeper rule the q68/q69
    * oracles use; output is the kept vec_ids.
    */
  val kmeansDrop: String =
    s"""WITH RECURSIVE $assignCtes,
       $kmeansPairsCte,
       edges AS (SELECT id1 AS u, id2 AS v FROM pairs
                 UNION SELECT id2 AS u, id1 AS v FROM pairs),
       reach AS (SELECT u AS id, u AS lab FROM edges
                 UNION
                 SELECT e2.u AS id, r.lab FROM edges e2 JOIN reach r ON r.id = e2.v),
       comp AS (SELECT id, CAST(min(lab) AS BIGINT) AS component
                FROM reach GROUP BY id)
       SELECT e.vec_id FROM e
       WHERE NOT EXISTS (SELECT 1 FROM comp
                         WHERE comp.id = e.vec_id
                           AND comp.component <> e.vec_id)
       ORDER BY vec_id"""

  /** PQ encode + per-query ADC tables, shared by q85/q109: every vector
    * sliced into 8 contiguous 8-dim subvectors, each quantized to its
    * nearest frozen sub-centroid (ties to the lower code — the
    * `Pq.nearestSub` order); ADC dot/norm terms come from the SAME
    * codebook rows.
    */
  private val pqCtes: String =
    s"""$cbCte,
       js AS (SELECT unnest(range(0, 8)) AS j),
       sl AS (SELECT vec_id, j, v[j*8+1 : j*8+8] AS s FROM e CROSS JOIN js),
       enc AS (
         SELECT vec_id, j, code FROM (
           SELECT sl.vec_id, sl.j, cb.code,
                  row_number() OVER (PARTITION BY sl.vec_id, sl.j
                                     ORDER BY list_distance(sl.s, cb.cvec),
                                              cb.code) AS rn
           FROM sl JOIN cb ON cb.j = sl.j)
         WHERE rn = 1),
       q AS (SELECT vec_id AS query_id, v AS qv FROM e
             WHERE vec_id IN (0,1,2,3,4,5,6,7,8,9)),
       qn AS (SELECT query_id, sqrt(list_inner_product(qv, qv)) AS qnorm FROM q),
       qtab AS (
         SELECT q.query_id, cb.j, cb.code,
                list_inner_product(q.qv[cb.j*8+1 : cb.j*8+8], cb.cvec) AS dp,
                list_inner_product(cb.cvec, cb.cvec) AS n2
         FROM q CROSS JOIN cb)"""

  /** ADC scoring + 50-candidate shortlist + exact re-rank top-5, shared
    * tail of q85/q109. `cand` must provide (query_id, neighbor_id).
    */
  private def adcTail(candCte: String): String =
    s"""$candCte,
       adc AS (
         SELECT c.query_id, c.neighbor_id,
                sum(t.dp) AS dot, sum(t.n2) AS xn2
         FROM cand c
         JOIN enc ON enc.vec_id = c.neighbor_id
         JOIN qtab t ON t.query_id = c.query_id
                    AND t.j = enc.j AND t.code = enc.code
         GROUP BY c.query_id, c.neighbor_id),
       short AS (
         SELECT query_id, neighbor_id FROM (
           SELECT a.query_id, a.neighbor_id,
                  round(a.dot / (qn.qnorm * sqrt(a.xn2)), 6) AS adc_cos,
                  row_number() OVER (PARTITION BY a.query_id
                                     ORDER BY round(a.dot / (qn.qnorm * sqrt(a.xn2)), 6) DESC,
                                              a.neighbor_id) AS rn
           FROM adc a JOIN qn ON qn.query_id = a.query_id
           WHERE qn.qnorm * sqrt(a.xn2) <> 0)
         WHERE rn <= 50),
       rescored AS (
         SELECT s.query_id, s.neighbor_id,
                round(list_cosine_similarity(en.v, q.qv), 6) AS cos_sim
         FROM short s
         JOIN e en ON en.vec_id = s.neighbor_id
         JOIN q ON q.query_id = s.query_id)
       SELECT query_id, neighbor_id, cos_sim, rank FROM (
         SELECT query_id, neighbor_id, cos_sim,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
         FROM rescored)
       WHERE rank <= 5
       ORDER BY query_id, neighbor_id"""

  /** q85: PQ/ADC over the whole corpus (no coarse filter). */
  val pqTopK: String =
    s"""WITH $centsCte,
       e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       $pqCtes,
       ${adcTail(
        """cand AS (
         SELECT q.query_id, e2.vec_id AS neighbor_id
         FROM e e2 CROSS JOIN q
         WHERE e2.vec_id <> q.query_id)""")}"""

  /** q109: IVF-PQ — ADC candidates restricted to the 6 probed frozen
    * cells, then the same shortlist + exact re-rank.
    */
  val ivfPqTopK: String =
    s"""WITH $assignCtes,
       $probesCte,
       $pqCtes,
       ${adcTail(
        """cand AS (
         SELECT p.query_id, a.vec_id AS neighbor_id
         FROM probes p JOIN assign a ON a.cell = p.cell
         WHERE a.vec_id <> p.query_id)""")}"""

  /** SRP hyperplane VALUES table. The planes are a PURE FUNCTION of the
    * committed seeds (`VectorSearch.hyperplanes` — java.util.Random
    * gaussians), so the oracle interpolates them at SQL-build time; no
    * freeze file is needed, and a seed change rewrites both engines at
    * once. Doubles print shortest-round-trip, so DuckDB recovers the
    * identical IEEE-754 planes and the sign-of-dot buckets match
    * bit-for-bit (the dot products are the same elementwise
    * float→double products summed in order on both engines).
    */
  private def planesCte(tables: Int, nBits: Int, seedBase: Long): String =
    "planes(tbl, bit, pvec) AS (\n         SELECT * FROM (VALUES\n" +
      (for {
        t <- 0 until tables
        (p, b) <- graft.operators.VectorSearch
          .hyperplanes(nBits, 64, seedBase + t).zipWithIndex
      } yield s"           ($t, $b, ${sqlVec(p.toVector)})")
        .mkString(",\n") +
      "))"

  /** Per-(vector, table) SRP bucket: bit i set iff dot(v, plane_i) >= 0
    * — the `VectorSearch.srpSignatureArray` rule (the NaN branch cannot
    * fire on the finite fixture vectors).
    */
  private val srpSigCte: String =
    """sig AS (
         SELECT e.vec_id, p.tbl,
                CAST(sum(CASE WHEN list_inner_product(e.v, p.pvec) >= 0
                         THEN CAST(1 AS BIGINT) << p.bit ELSE 0 END)
                  AS BIGINT) AS bucket
         FROM e CROSS JOIN planes p
         GROUP BY 1, 2)"""

  /** q36: multi-table SRP top-5 — candidates share the query's bucket
    * in >= 1 of the 16 four-bit tables (seed base 0x9e3779b9), then
    * exact rounded cosine and the q35 ranking.
    */
  val srpTopK: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
       ${planesCte(tables = 16, nBits = 4, seedBase = 0x9e3779b9L)},
       $srpSigCte,
       q AS (SELECT vec_id AS query_id, tbl, bucket FROM sig
             WHERE vec_id IN (0,1,2,3,4,5,6,7,8,9)),
       cand AS (
         SELECT DISTINCT q.query_id, s.vec_id AS neighbor_id
         FROM q JOIN sig s ON s.tbl = q.tbl AND s.bucket = q.bucket
         WHERE s.vec_id <> q.query_id),
       scored AS (
         SELECT c.query_id, c.neighbor_id,
                round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
         FROM cand c
         JOIN e a ON a.vec_id = c.neighbor_id
         JOIN e b ON b.vec_id = c.query_id)
       SELECT query_id, neighbor_id, cos_sim, rank FROM (
         SELECT query_id, neighbor_id, cos_sim,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rank
         FROM scored)
       WHERE rank <= 5
       ORDER BY query_id, neighbor_id"""

  /** q46: SRP near-dup pairs — candidates share a bucket in >= 1 of the
    * 4 two-bit tables (seed base 0x5eed), exact rounded cosine >= 0.4.
    */
  val srpPairs: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
       ${planesCte(tables = 4, nBits = 2, seedBase = 0x5eedL)},
       $srpSigCte,
       cand AS (
         SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
         FROM sig a JOIN sig b ON a.tbl = b.tbl AND a.bucket = b.bucket
         WHERE a.vec_id < b.vec_id)
       SELECT id1, id2, cos_sim FROM (
         SELECT c.id1, c.id2,
                round(list_cosine_similarity(x.v, y.v), 6) AS cos_sim
         FROM cand c
         JOIN e x ON x.vec_id = c.id1
         JOIN e y ON y.vec_id = c.id2)
       WHERE cos_sim >= 0.4
       ORDER BY id1, id2"""

  /** q121: projection onto the FROZEN top-4 PCA components (mean and
    * eigenvectors committed in `FrozenCentroids`; the live fit is
    * drift-gated equal, so the hash compare certifies the moment pass,
    * the Jacobi eigensolver AND the projection). The comprehension
    * replays Spark's exact per-index (x_i − μ_i)·v_i products; both
    * engines round to 6 decimals before comparing.
    */
  val pcaProject: String = {
    val mu = sqlVec(FrozenCentroids.oraclePcaMean)
    val comps = FrozenCentroids.oraclePcaEigen.zipWithIndex
      .map { case ((_, v), i) => s"           ($i, ${sqlVec(v)})" }
      .mkString(",\n")
    s"""WITH mu(muvec) AS (VALUES ($mu)),
       comps(cid, cvec) AS (
         SELECT * FROM (VALUES
$comps)),
       e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       proj AS (
         SELECT e.vec_id, c.cid,
                round(list_sum([c.cvec[i] * (e.v[i] - m.muvec[i])
                                for i in range(1, ${FrozenCentroids.oraclePcaMean.size + 1})]),
                      6) AS pc
         FROM e CROSS JOIN comps c CROSS JOIN mu m)
       SELECT vec_id,
              max(CASE WHEN cid = 0 THEN pc END) AS pc0,
              max(CASE WHEN cid = 1 THEN pc END) AS pc1,
              max(CASE WHEN cid = 2 THEN pc END) AS pc2,
              max(CASE WHEN cid = 3 THEN pc END) AS pc3
       FROM proj GROUP BY vec_id
       ORDER BY vec_id"""
  }

  /** q137: per-frozen-cell quota of 5, md5-hash-ranked with vec_id
    * tiebreak — the q111/q77 rank-key idiom over k-means cells.
    */
  val diversitySample: String =
    s"""WITH $assignCtes,
       r AS (SELECT cell, vec_id,
                    ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
                      AS rk
             FROM assign),
       w AS (SELECT cell, vec_id,
                    CAST(row_number() OVER (PARTITION BY cell
                                            ORDER BY rk, vec_id) AS BIGINT) AS rn
             FROM r)
       SELECT cell, vec_id, rn FROM w WHERE rn <= 5
       ORDER BY cell, rn"""
}
