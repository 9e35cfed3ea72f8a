package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.Ids.longId

/** Benchmark decontamination: remove training docs that share any word
  * n-gram with an evaluation/benchmark set — the overlap rule the GPT-3
  * and PaLM reports apply before training (they use 8–13-grams; `n` is a
  * parameter here).
  *
  * Scale shape, corpus-side map-only: the benchmark is eval-set-sized
  * (thousands of docs), so its distinct n-grams BROADCAST; corpus docs
  * stream through a typed flatMap emitting per-doc distinct n-grams that
  * die in a broadcast left-semi join unless contaminated. The only
  * shuffles are a distinct over the (small) contaminated id set, which
  * then broadcasts back into the anti-join — the 100 TB corpus is never
  * shuffled, only scanned.
  */
object Decontamination {

  /** (id, gram) rows: one per DISTINCT word n-gram per doc; docs shorter
    * than n words emit none (they cannot contain an n-gram — the same
    * rule the SQL oracle applies).
    */
  private[operators] def grams(docs: DataFrame, n: Int, textCol: String,
      idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(longId(idCol).as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        val w = (if (t == null) "" else t.trim).split("\\s+")
        if (w.length < n) Iterator.empty[(Long, String)]
        else {
          val gs: Set[String] = w.sliding(n).map(_.mkString(" ")).toSet
          gs.iterator.map(g => (id, g))
        }
      }
      .toDF("id", "gram")
  }

  /** Distinct ids of corpus docs sharing >= 1 word n-gram with any
    * benchmark doc.
    */
  def contaminatedIds(docs: DataFrame, bench: DataFrame, n: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    grams(docs, n, textCol, idCol)
      .join(broadcast(grams(bench, n, textCol, idCol)
        .select("gram").distinct()), Seq("gram"), "left_semi")
      .select("id")
      .distinct()

  /** Corpus minus contaminated docs. Output equals the plain n-gram
    * overlap anti-join (the oracle formulation); docs with no n-gram
    * (< n words) are always kept.
    */
  def decontaminate(docs: DataFrame, bench: DataFrame, n: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val bad = contaminatedIds(docs, bench, n, textCol, idCol)
    docs.join(broadcast(bad), longId(idCol) === bad("id"), "left_anti")
  }
}
