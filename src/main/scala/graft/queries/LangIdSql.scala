package graft.queries

import graft.operators.LangId

/** DuckDB SQL twin of the trained NB language identifier
  * ([[graft.operators.LangId]]), assembled programmatically from the
  * SAME in-memory quantized model the Spark kernel scores with — the
  * oracle and the engine cannot drift, because there is no second copy
  * of the weights. Scoring is exact BIGINT arithmetic in both engines
  * (`prior + n_grams·floor + Σ delta(bucket)`); the only float work
  * (StrictMath.log at model init) happens once in Scala and reaches
  * this SQL already quantized.
  *
  * Character parity: DuckDB `length`/`substr`/`unicode` operate on
  * code points, and since round 15 the Scala kernel's gram stream does
  * too ([[LangId.buckets]] iterates `codePointAt`), so the contract
  * covers supplementary-plane text — emoji and CJK-B hash to the same
  * buckets in both engines (VERDICT r14 #5, fuzz-gated).
  */
object LangIdSql {

  /** VALUES rows (bucket, delta per lang) for every bucket some lang
    * trained; untouched buckets contribute only the floor, which the
    * `n_grams·floor` term already counts.
    */
  private def weightsValues: String = {
    val m = LangId.model
    val rows = (0 until LangId.Dim).flatMap { b =>
      val ds = m.deltas.map(_(b))
      if (ds.forall(_ == 0L)) None
      else Some(s"($b, ${ds.mkString(", ")})")
    }
    rows.mkString(",\n           ")
  }

  /** Scoring CTE chain over a prior CTE `docsCte(doc_id, text)`:
    * produces `lid_pred(doc_id, n_grams, s_<lang>..., lang_pred)`.
    * CTE names are lid_-prefixed so the chain embeds into any oracle
    * (q162 standalone, q37's TextAnalysisSql).
    */
  def scoreCtes(docsCte: String): String = {
    val m = LangId.model
    val langs = LangId.Langs
    val d = LangId.Dim
    val b1 = s"(unicode(substr(lid_t, i, 1))) % $d"
    val b2 = s"(unicode(substr(lid_t, i, 1)) * ${LangId.GramB} + " +
      s"unicode(substr(lid_t, i + 1, 1))) % $d"
    val b3 = s"((unicode(substr(lid_t, i, 1)) * ${LangId.GramB} + " +
      s"unicode(substr(lid_t, i + 1, 1))) * ${LangId.GramB} + " +
      s"unicode(substr(lid_t, i + 2, 1))) % $d"
    // 4-gram hash peaks at ~2.02e9 for BMP chars — within 6% of INT32
    // max, so accumulate in BIGINT from the first multiply (the
    // murmur3-CJK INT32-overflow class the round-13 fuzz caught)
    val b4 = s"(((CAST(unicode(substr(lid_t, i, 1)) AS BIGINT) * ${LangId.GramB} + " +
      s"unicode(substr(lid_t, i + 1, 1))) * ${LangId.GramB} + " +
      s"unicode(substr(lid_t, i + 2, 1))) * ${LangId.GramB} + " +
      s"unicode(substr(lid_t, i + 3, 1))) % $d"
    val sumCols = langs.map(l =>
      s"sum(coalesce(w.d_$l, 0)) AS dsum_$l").mkString(",\n                ")
    val scoreCols = langs.zipWithIndex.map { case (l, li) =>
      s"${m.priors(li)} + coalesce(s.ng, 0) * ${m.floors(li)}" +
        s" + coalesce(s.dsum_$l, 0) AS s_$l"
    }.mkString(",\n                ")
    val mx = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
    val langCase = langs.map(l => s"WHEN s_$l = mx THEN '$l'").mkString(" ")
    s"""lid_norm AS (
         SELECT doc_id,
                translate(trim(regexp_replace(text, '[\\s\\x0B]+', ' ', 'g')),
                          'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                          'abcdefghijklmnopqrstuvwxyz') AS lid_t
         FROM $docsCte),
       lid_pos AS (
         SELECT doc_id, lid_t, unnest(range(1, length(lid_t) + 1)) AS i
         FROM lid_norm),
       lid_g AS (
         SELECT doc_id, $b1 AS b FROM lid_pos
         UNION ALL
         SELECT doc_id, $b2 AS b FROM lid_pos WHERE i + 1 <= length(lid_t)
         UNION ALL
         SELECT doc_id, $b3 AS b FROM lid_pos WHERE i + 2 <= length(lid_t)
         UNION ALL
         SELECT doc_id, $b4 AS b FROM lid_pos WHERE i + 3 <= length(lid_t)),
       lid_w AS (
         SELECT * FROM (VALUES
           $weightsValues
         ) AS t(b, ${langs.map(l => s"d_$l").mkString(", ")})),
       lid_sum AS (
         SELECT g.doc_id, count(*) AS ng,
                $sumCols
         FROM lid_g g LEFT JOIN lid_w w USING (b)
         GROUP BY g.doc_id),
       lid_scored AS (
         SELECT n.doc_id, CAST(coalesce(s.ng, 0) AS BIGINT) AS n_grams,
                $scoreCols
         FROM lid_norm n LEFT JOIN lid_sum s USING (doc_id)),
       lid_pred AS (
         SELECT doc_id, n_grams,
                ${langs.map(l => s"CAST(s_$l AS BIGINT) AS s_$l").mkString(", ")},
                CASE WHEN n_grams = 0 THEN '${LangId.Unknown}'
                     $langCase
                     ELSE '${LangId.Unknown}' END AS lang_pred
         FROM (SELECT *, $mx AS mx FROM lid_scored))"""
  }

  /** q162 oracle: the full scoring pipeline over the documents table. */
  val q162: String =
    s"""WITH d AS (SELECT doc_id, text FROM documents),
       ${scoreCtes("d")}
       SELECT doc_id, n_grams,
              ${LangId.Langs.map(l => s"s_$l").mkString(", ")}, lang_pred
       FROM lid_pred
       ORDER BY doc_id"""
}
