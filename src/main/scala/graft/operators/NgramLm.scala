package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language-model scoring with Stupid Backoff (Brants et al.
  * 2007, "Large Language Models in Machine Translation") — the
  * perplexity-style quality signal CCNet/Gopher-class pipelines use to
  * rank web text against a trusted reference corpus, built the way that
  * paper builds it: counts only, no discounting, backoff to the unigram
  * distribution with a fixed penalty when a bigram is unseen.
  *
  * Per transition (w1 -> w2):
  *   S(w2|w1) = c(w1 w2) / c(w1)            if c(w1 w2) > 0
  *            = alpha * c(w2) / N           otherwise (0 if w2 unseen)
  * and a document scores the mean of S over its transitions.
  *
  * The GRADED surface quantizes S to integer micro-probability
  * (`floor(1e6 * S)` via BIGINT division) so every sum is an exact
  * integer and one final division produces the mean — the q79 device
  * that makes the result bit-identical cross-engine regardless of
  * summation order. The natural-log variant ([[stupidBackoffLogScore]])
  * keeps real `ln` semantics for in-pipeline use and is unit-pinned
  * instead (cross-engine `ln` is not bit-stable).
  *
  * 100 TB shape: training is two partial-aggregated counts over one
  * token/bigram explosion; scoring is two equi-joins (bigram, unigram)
  * against count tables that are vocabulary-sized, not corpus-sized,
  * followed by a per-doc partial agg. Nothing is collected; the
  * alpha/N normalizer rides a broadcast single-row cross join. Hot
  * tokens ("the") skew the unigram join — AQE's skew split applies, as
  * in TF-IDF (`TfIdfSkewSpec`).
  */
object NgramLm {

  /** Micro-prob alpha for the backoff branch: 0.4 (the paper's value),
    * as an exact integer scale so `alpha * c(w2) / N` stays rational.
    */
  val AlphaMicro = 400000L

  private def toks(textCol: String) = split(trim(col(textCol)), "\\s+")

  /** (w1, w2) transition stream: doc_id, position-ordered bigrams. */
  private def transitions(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), toks(textCol).as("t"))
      // sub-2-token docs have no transitions; without this guard,
      // sequence(1, size-1) DESCENDS for size 1 and fabricates rows
      .filter(size(col("t")) > 1)
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))")))
      .select(col("doc_id"), col("col.w1"), col("col.w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")

  /** Train bigram + unigram counts on `train`, score every `docs` row:
    * `(doc_id, n_trans, sum_p_micro, mean_p_micro)` with the integer
    * micro-probability semantics above. Docs with fewer than two tokens
    * score 0 over 0 transitions (kept, not dropped).
    */
  def stupidBackoffScore(docs: DataFrame, train: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val bigrams = transitions(train, textCol, idCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val unigrams = train
      .select(explode(toks(textCol)).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cu"))
    val contexts = unigrams.select(col("w").as("w1"), col("cu").as("c1"))
    val totals = unigrams.agg(sum("cu").as("n_total"))

    val scored = transitions(docs, textCol, idCol)
      .join(bigrams, Seq("w1", "w2"), "left")
      .join(contexts, Seq("w1"), "left")
      .join(unigrams.select(col("w").as("w2"), col("cu").as("c2")),
        Seq("w2"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        when(col("cb").isNotNull,
          expr("(1000000 * cb) DIV c1"))
          .otherwise(expr(
            s"($AlphaMicro * coalesce(c2, 0)) DIV n_total"))
          .as("p_micro"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trans"), sum("p_micro").as("sum_p_micro"))

    docs.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trans"), lit(0L)).as("n_trans"),
        coalesce(col("sum_p_micro"), lit(0L)).as("sum_p_micro"))
      .withColumn("mean_p_micro",
        expr("CASE WHEN n_trans > 0 THEN sum_p_micro DIV n_trans ELSE 0 END"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    * doc against the reference LM ([[stupidBackoffScore]]), then split
    * each group (language) into `head` / `middle` / `tail` by that
    * group's OWN score quantiles — the relative-to-language cut that
    * makes the buckets comparable across high- and low-resource
    * languages. Here higher `mean_p_micro` = more reference-like =
    * lower perplexity, so `head` is the `>= hiQ`-quantile slice.
    *
    * The thresholds are an aggregated |groups|×2 table broadcast back —
    * the q132 shape — NOT a per-group percent_rank window over the
    * corpus: a billion-doc language never funnels through one task.
    * Docs with a NULL group are dropped (no threshold is definable for
    * them), mirroring [[Curation.quantileKeep]]'s contract.
    *
    * Quantiles are Spark's exact `percentile` (type-7 linear
    * interpolation, bit-matched by DuckDB's `quantile_cont` on integer
    * inputs — the q132-proven pairing), over the exact-integer
    * micro-probability scores, so the bucket boundary replays
    * identically cross-engine.
    */
  def perplexityBuckets(docs: DataFrame, train: DataFrame,
      groupCol: String = "lang", loQ: Double = 0.25, hiQ: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(loQ > 0.0 && hiQ < 1.0 && loQ < hiQ,
      s"quantiles must satisfy 0 < loQ < hiQ < 1: $loQ, $hiQ")
    val scored = stupidBackoffScore(docs, train, textCol, idCol)
    val withG = docs.select(col(idCol).as("doc_id"), col(groupCol))
      .join(scored, Seq("doc_id"))
    val thr = withG.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(expr(s"percentile(mean_p_micro, $loQ)").as("lo"),
        expr(s"percentile(mean_p_micro, $hiQ)").as("hi"))
    withG.join(broadcast(thr), Seq(groupCol))
      .select(col("doc_id"), col(groupCol), col("mean_p_micro"),
        col("lo"), col("hi"),
        when(col("mean_p_micro") >= col("hi"), lit("head"))
          .when(col("mean_p_micro") >= col("lo"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Real-log variant: mean ln S per transition (the negated bigram
    * log-perplexity), with the unseen-everywhere floor ln(alpha / N).
    * Same plan shape as the graded twin; unit-pinned in NgramLmSpec
    * (closed forms on a hand corpus), not oracled — see object doc.
    */
  def stupidBackoffLogScore(docs: DataFrame, train: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val bigrams = transitions(train, textCol, idCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val unigrams = train
      .select(explode(toks(textCol)).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cu"))
    val contexts = unigrams.select(col("w").as("w1"), col("cu").as("c1"))
    val totals = unigrams.agg(sum("cu").as("n_total"))

    transitions(docs, textCol, idCol)
      .join(bigrams, Seq("w1", "w2"), "left")
      .join(contexts, Seq("w1"), "left")
      .join(unigrams.select(col("w").as("w2"), col("cu").as("cu2")),
        Seq("w2"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        when(col("cb").isNotNull,
          log(col("cb").cast("double") / col("c1").cast("double")))
          .otherwise(log(
            lit(0.4) * (coalesce(col("cu2"), lit(1L)).cast("double")) /
              col("n_total").cast("double")))
          .as("ln_s"))
      .groupBy("doc_id")
      .agg((sum("ln_s") / count(lit(1))).as("mean_ln_s"))
  }
}
