package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion: combine N independently-retrieved ranked
  * candidate lists (lexical BM25, dense cosine ANN, …) into one ranking
  * with Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
  * `rrf(d) = Σ_lists 1 / (c + rank_list(d))`, with a document absent
  * from a list contributing exactly 0. RRF is the standard score-free
  * fusion for retrieval-augmented pipelines — it needs no score
  * calibration between BM25's unbounded sums and cosine's [-1, 1], only
  * the integer ranks, which both retrievers here produce
  * deterministically (score desc, id tiebreak).
  *
  * Scale shape: fusion runs over ALREADY-BOUNDED retrieved lists (top-N
  * per retriever — tens to thousands of rows), never over the corpus,
  * so the joins are broadcast-sized by construction no matter how large
  * the corpus the retrievers searched; the corpus-scale work lives in
  * the retrievers ([[TfIdf.bm25]]'s one-scan pivot, [[VectorSearch]]'s
  * broadcast two-phase top-k), which are bounded separately. The final
  * top-k is sort+limit = TakeOrderedAndProject (distributed heap), and
  * the rank window runs over k rows only.
  *
  * Determinism: ranks are BIGINT, `1.0 / (c + rank)` is one exact double
  * division, and the per-list contributions are added LEFT-TO-RIGHT in
  * the fixed list order (the q76 discipline — float addition is not
  * associative, a fold order shared with the oracle is). Callers that
  * hash-compare should floor-quantize the fused score.
  */
object HybridSearch {

  /** Fuse ranked lists `(df, rankCol)` — each `df` carrying `idCol` and
    * its integer rank column, every `rankCol` name distinct — into the
    * top-`k` docs by RRF score (ties broken by id). Output:
    * `(idCol, <rankCol per list>, rrf_score, rank)`; a doc missing from
    * a list keeps a NULL rank column and contributes 0 to the score.
    *
    * CONTRACT: each input list must contain each id AT MOST ONCE (every
    * retriever in this repo emits per-query row_number ranks, which
    * guarantees it). A duplicate id would multiply rows through the
    * full-outer reduce and contribute to `rrf_score` once per copy —
    * silently inflating that doc. Callers fusing arbitrary external
    * lists should `dropDuplicates(idCol)` first (ADVICE r10).
    */
  def rrfFuse(lists: Seq[(DataFrame, String)], idCol: String = "doc_id",
      k: Int = 10, c: Int = 60): DataFrame = {
    require(lists.size >= 2, "rrf fusion needs at least two ranked lists")
    require(lists.map(_._2).distinct.size == lists.size,
      "every ranked list needs a distinct rank column name")
    val joined = lists.map { case (df, rc) => df.select(col(idCol), col(rc)) }
      .reduceLeft((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val contrib: Column = lists.map { case (_, rc) =>
      coalesce(lit(1.0) / (lit(c.toDouble) + col(rc)), lit(0.0))
    }.reduceLeft(_ + _)
    val topK = joined
      .withColumn("rrf_score", contrib)
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(k)
    topK
      .withColumn("rank",
        row_number()
          .over(Window.orderBy(col("rrf_score").desc, col(idCol)))
          .cast("long"))
  }
}
