package graft.queries

/** DuckDB twin for q40 — the flagship DIRT similarity query — closing
  * the last algorithmic rows-only gap (round 12). The planted biarc
  * corpus is pure string interpolation (`PlantedBiarc.lines`), so the
  * oracle regenerates the canonical PATH INSTANCES relationally (one
  * instance per line: the `N:<nsubj:V:verb:>prep:P:prep:>pobj:N` path
  * with the two noun fillers — exactly what
  * parse → extract → stem produces for this corpus shape; if the
  * Spark side ever stems, filters or fans out differently, its triples
  * change and the hash compare fails) and then replays the ENTIRE
  * DIRT algebra: triple aggregation, both margins, global N, the
  * mi = ln(cnt·N/(ps·sw)) features with the reference's 0.001 keep
  * threshold, SumMI, the pair feature intersection and Lin's
  * geometric-mean similarity — the five reference MapReduce jobs as
  * one SQL statement.
  *
  * Float discipline: both engines round the final score to 6 decimals
  * (the q35 convention), absorbing libm `ln` and summation-order ulps;
  * the mi > 0.001 keep decision is safe by construction — the planted
  * corpus's six distinct margin combinations put the nearest mi 5.3
  * away from the threshold (audited round 12).
  */
object DirtSql {

  val plantedSimilarity: String =
    """WITH fams(fam, ng) AS (VALUES (0, 50), (1, 25), (2, 25)),
       base AS (
         SELECT fam, k, j, prep FROM fams
         CROSS JOIN (SELECT unnest(range(0, 50)) AS k) ks
         CROSS JOIN (SELECT unnest(range(0, 8)) AS j) js
         CROSS JOIN (SELECT unnest(['from', 'of']) AS prep) ps
         WHERE k < ng),
       inst AS (
         SELECT
           'N:<nsubj:V:' ||
             (CASE fam WHEN 0 THEN 'vtw' || k
                       WHEN 1 THEN 'vdj' || k
                       ELSE 'vpt' || k END) ||
             ':>prep:P:' || prep || ':>pobj:N' AS path,
           CASE fam WHEN 0 THEN 'a' || k || 'x' || j
                    WHEN 1 THEN 'd' || prep || k || 'x' || j
                    ELSE CASE WHEN j < 4 THEN 'p' || k || 'x' || j
                              ELSE 'p' || prep || k || 'x' || j END END AS x,
           CASE fam WHEN 0 THEN 'b' || k || 'y' || j
                    WHEN 1 THEN 'e' || prep || k || 'y' || j
                    ELSE CASE WHEN j < 4 THEN 'q' || k || 'y' || j
                              ELSE 'q' || prep || k || 'y' || j END END AS y,
           CAST(1 + (j % 3) AS BIGINT) AS cnt
         FROM base),
       triples AS (
         SELECT path, slot, word, sum(cnt) AS cnt FROM (
           SELECT path, 'X' AS slot, x AS word, cnt FROM inst
           UNION ALL
           SELECT path, 'Y' AS slot, y AS word, cnt FROM inst)
         GROUP BY 1, 2, 3),
       sw AS (SELECT slot, word, sum(cnt) AS sw_cnt FROM triples GROUP BY 1, 2),
       ps AS (SELECT path, slot, sum(cnt) AS ps_cnt FROM triples GROUP BY 1, 2),
       nn AS (SELECT CASE WHEN coalesce(sum(cnt), 0) = 0 THEN 1
                     ELSE sum(cnt) END AS n FROM triples),
       mi AS (
         SELECT t.path, t.slot, t.word,
                ln(CAST(t.cnt AS DOUBLE) * CAST(nn.n AS DOUBLE)
                   / (CAST(ps.ps_cnt AS DOUBLE) * CAST(sw.sw_cnt AS DOUBLE)))
                  AS mi
         FROM triples t
         JOIN sw ON sw.slot = t.slot AND sw.word = t.word
         JOIN ps ON ps.path = t.path AND ps.slot = t.slot
         CROSS JOIN nn
         WHERE t.cnt > 0 AND ps.ps_cnt * sw.sw_cnt > 0
           AND ln(CAST(t.cnt AS DOUBLE) * CAST(nn.n AS DOUBLE)
                  / (CAST(ps.ps_cnt AS DOUBLE) * CAST(sw.sw_cnt AS DOUBLE)))
               > 0.001),
       summi AS (SELECT path, slot, sum(mi) AS sum_mi FROM mi GROUP BY 1, 2),
       verbs AS (
         SELECT (CASE fam WHEN 0 THEN 'vtw' WHEN 1 THEN 'vdj'
                 ELSE 'vpt' END) || k AS v
         FROM fams CROSS JOIN (SELECT unnest(range(0, 50)) AS k) ks
         WHERE k < ng),
       pairs AS (
         SELECT 'N:<nsubj:V:' || v || ':>prep:P:from:>pobj:N' AS p1,
                'N:<nsubj:V:' || v || ':>prep:P:of:>pobj:N' AS p2
         FROM verbs),
       active AS (
         SELECT DISTINCT p.p1, p.p2 FROM pairs p
         JOIN mi ON mi.path = p.p1 OR mi.path = p.p2),
       nums AS (
         SELECT pr.p1, pr.p2,
                sum(CASE WHEN f1.slot = 'X' THEN f1.mi + f2.mi ELSE 0 END)
                  AS numX,
                sum(CASE WHEN f1.slot = 'Y' THEN f1.mi + f2.mi ELSE 0 END)
                  AS numY
         FROM pairs pr
         JOIN mi f1 ON f1.path = pr.p1
         JOIN mi f2 ON f2.path = pr.p2 AND f2.slot = f1.slot
                                       AND f2.word = f1.word
         WHERE pr.p1 <> pr.p2
         GROUP BY 1, 2),
       members AS (SELECT p1 AS path FROM pairs UNION SELECT p2 FROM pairs),
       sm AS (
         SELECT s.path,
                sum(CASE WHEN s.slot = 'X' THEN s.sum_mi ELSE 0 END) AS smX,
                sum(CASE WHEN s.slot = 'Y' THEN s.sum_mi ELSE 0 END) AS smY
         FROM summi s JOIN members m ON m.path = s.path
         GROUP BY 1),
       scored AS (
         SELECT a.p1, a.p2,
                coalesce(n.numX, 0.0) AS numX, coalesce(n.numY, 0.0) AS numY,
                coalesce(s1.smX, 0.0) AS s1X, coalesce(s1.smY, 0.0) AS s1Y,
                coalesce(s2.smX, 0.0) AS s2X, coalesce(s2.smY, 0.0) AS s2Y
         FROM active a
         LEFT JOIN nums n ON n.p1 = a.p1 AND n.p2 = a.p2
         LEFT JOIN sm s1 ON s1.path = a.p1
         LEFT JOIN sm s2 ON s2.path = a.p2)
       SELECT p1 AS path1, p2 AS path2,
              round(sqrt(
                (CASE WHEN s1X + s2X > 0
                      THEN numX / (s1X + s2X) ELSE 0.0 END) *
                (CASE WHEN s1Y + s2Y > 0
                      THEN numY / (s1Y + s2Y) ELSE 0.0 END)), 6) AS score
       FROM scored
       ORDER BY path1, path2"""
}
