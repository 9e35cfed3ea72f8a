package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PMI collocation mining: rank adjacent-word bigrams by pointwise
  * mutual information — the corpus-statistics step that feeds tokenizer
  * vocabularies ("new york" should be one unit), stopword-phrase lists,
  * and boilerplate detection. This is the reference's own MI idea
  * (DirtDriver's slot-word MI, `DirtDriver.java:698`) lifted from
  * dependency slots to surface bigrams.
  *
  * PMI(x,y) = p(xy) / (p(x)·p(y)) = c_xy·N_u² / (c_x·c_y·N_b), with
  * unigram total N_u and bigram total N_b. Like `Selection`/q140, `ln`
  * is banned from the oracled path: the ratio is quantized ONCE per
  * bigram to the pure-integer
  *
  *   pmi_q = c_xy · N_u² · scale  div  (c_x · c_y · N_b)
  *
  * — exact, order-independent, bit-identical in any engine (the
  * monotone log is a presentation choice, not information). Overflow
  * contract: c_xy·N_u²·scale < 2⁶³, i.e. N_u ≲ 3·10⁶ tokens at the
  * default scale with c_xy ≤ 10³ — the FIXTURE regime. At corpus scale,
  * pre-divide (`(c_xy·scale div c_x)·N_u div c_y·…`) or drop to
  * Double (53-bit-exact for counts < 2⁵³) — both monotone-preserving
  * variants of the same statistic; the oracled query pins the exact
  * small-scale form.
  *
  * Scale shape: bigrams come from ONE transform over the token array
  * (no positional self-join — adjacency is array structure, not a
  * shuffle); unigram/bigram counts are two-phase partial aggs,
  * persisted ONCE because both the totals normalizer and the scoring
  * join consume them (uncached, each consumer re-scans the corpus —
  * plan-audited to two parquet scans) and released after the caller's
  * first action; the bigram⋈unigram joins key on the Zipf-skewed words
  * (AQE skew territory, the TfIdf shape); scalars N_u/N_b ride a
  * broadcast 1-row aggregate (the lazy-N rule). Top-k is a bounded
  * TakeOrderedAndProject.
  */
object Collocations {

  /** Top-k bigrams with c_xy ≥ minCount by quantized PMI (desc), then
    * (w1, w2) for a total order. Output columns are all BIGINT/string.
    */
  def topBigramsByPmi(docs: DataFrame, k: Int, minCount: Long = 5L,
      scale: Long = 1000L, textCol: String = "text"): DataFrame = {
    require(k > 0 && minCount > 0 && scale > 0,
      s"positive k/minCount/scale required: $k/$minCount/$scale")
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val tokenized = docs
      .select(filter(toks, t => t =!= "").as("toks"))
    // persist-once: both count tables are consumed twice (the totals
    // normalizer AND the scoring join); uncached, every consumer
    // re-scans and re-tokenizes the corpus — plan-audited down to two
    // parquet scans (one per count table), released after the caller's
    // first action (CacheRelease)
    val unigrams = tokenized
      .select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .persist()
    val bigramCounts = tokenized
      // guard: sequence(a, b) DESCENDS when b < a, so a 0/1-token doc
      // would fabricate negative indices (null bigrams) without it
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> struct(toks[i] AS w1, toks[i + 1] AS w2))")).as("b"))
      .select(col("b.w1"), col("b.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .persist()
    // N_b totals ALL bigrams — the probability normalizer — while the
    // minCount cut only bounds which bigrams are REPORTED
    val totals = unigrams.agg(sum("c").as("n_u"))
      .crossJoin(bigramCounts.agg(sum("c_xy").as("n_b")))
    val out = bigramCounts
      .filter(col("c_xy") >= minCount)
      .join(unigrams.select(col("w").as("w1"), col("c").as("c_x")), "w1")
      .join(unigrams.select(col("w").as("w2"), col("c").as("c_y")), "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
        expr(s"c_xy * n_u * n_u * ${scale}L div (c_x * c_y * n_b)")
          .as("pmi_q"))
      .orderBy(col("pmi_q").desc, col("w1"), col("w2"))
      .limit(k)
    graft.util.CacheRelease.afterFirstAction(out, Seq(unigrams, bigramCounts))
  }
}
