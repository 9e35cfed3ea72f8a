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
        // non-empty-token semantics (round-13 fuzz): mirrors the
        // oracle's list_filter(..., x -> x <> '') — see
        // TextAnalysis.repetitionStats for the Java-vs-SQL trim story
        val w = (if (t == null) "" else t).split("\\s+").filter(_.nonEmpty)
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

  /** Span-level decontamination (the PaLM-report variant of the doc-drop
    * rule above): instead of discarding a contaminated document, mask
    * every token covered by an occurrence of a benchmark n-gram, keeping
    * the rest of the document. Output per doc: token count, masked-token
    * count and the masked text.
    *
    * Scale shape: benchmark grams broadcast exactly as in
    * [[contaminatedIds]]; the corpus-side gram/coverage algebra is the
    * per-document window pattern of `TextAnalysis.dropRepeatedNgrams` —
    * every shuffle keyed by doc, state bounded by document length, the
    * corpus never joins against itself. Docs of fewer than `n` words
    * have no gram and pass through unmasked; all-whitespace docs vanish
    * (no tokens), the dropRepeatedNgrams contract.
    */
  def maskContaminatedSpans(docs: DataFrame, bench: DataFrame, n: Int = 3,
      mask: String = "<extra_id_0>", textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 2, s"n-gram size must be >= 2, got $n")
    require(mask.matches("[^'\\\\\\s]+"),
      s"mask must be a single quote-free token: '$mask'")
    val byPos = Window.partitionBy("id").orderBy("pos")
    val toks = docs
      .select(longId(idCol).as("id"),
        posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("pos", "word")))
      .filter(col("word") =!= "")
    val withGram = toks.withColumn("gram",
      when(lead("word", n - 1).over(byPos).isNotNull,
        concat_ws(" ",
          (0 until n).map(i => lead(col("word"), i).over(byPos)): _*)))
    val benchGrams = grams(bench, n, textCol, idCol)
      .select("gram").distinct().withColumn("hit", lit(1))
    val flagged = withGram
      .join(broadcast(benchGrams), Seq("gram"), "left")
      .withColumn("contaminated",
        when(col("hit").isNotNull, 1).otherwise(0))
    val cover = byPos.rowsBetween(-(n - 1), 0)
    flagged
      .withColumn("covered", max("contaminated").over(cover))
      .groupBy(col("id").as("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum("covered").cast("long").as("n_masked"),
        array_join(
          expr(s"transform(array_sort(collect_list(struct(pos, covered, word))), " +
            s"x -> IF(x.covered = 1, '$mask', x.word))"),
          " ").as("masked_text"))
  }
}
