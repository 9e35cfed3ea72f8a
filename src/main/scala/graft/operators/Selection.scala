package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Importance-based data selection (the DSIR shape, Xie et al. 2023:
  * pick pretraining docs whose unigram profile looks like a trusted
  * target slice) — the "choose what to train on" step that runs after
  * dedup/quality filtering and before mixture sampling.
  *
  * The standard formulation scores a doc by the log-likelihood ratio
  * Σ tf(w)·log(p_target(w)/p_source(w)) under add-1-smoothed unigram
  * models. `ln` is not correctly rounded across libm implementations
  * (see TfIdf's class doc — measured ~1/1000 last-ulp disagreements),
  * so like `TextAnalysis.lmScore` this operator ships a cross-engine
  * EXACT arithmetic variant as the oracled path: each term's
  * probability ratio is quantized ONCE to an integer
  *
  *   r_q(w) = (c_T(w)+1) · scale  div  (c_S(w)+1)
  *
  * (target count over source count, add-1 smoothed; the corpus IS the
  * source model, so c_T ≤ c_S and r_q ≤ scale), and the doc weight is
  * the pure-integer sum Σ tf(w)·r_q(w) — exact, order-independent,
  * bit-identical in any engine. Docs rank by the integer mean ratio
  * `weight div n_toks`, doc_id tiebreak. The (T_S+V)/(T_T+V)
  * normalizer is a corpus constant — it scales every doc identically
  * and cannot change the ranking, so it is omitted from the quantized
  * score entirely rather than approximated.
  *
  * Scale shape: one corpus scan builds (doc, term, tf); term counts are
  * a vocabulary-sized partial agg; the tf⋈ratio join shuffles on the
  * Zipf-skewed term key (AQE skew-split territory, the TfIdfSkewSpec
  * shape); per-doc sums are map-side partial. Nothing collects.
  * Overflow contract: intermediates stay in Long while
  * (max term count+1)·scale < 2^63 — at the default scale 10⁶ that is
  * ~9.2e12 occurrences of ONE term, i.e. tens of TB of text; shrink
  * `scale` if a single term ever exceeds it.
  */
object Selection {

  /** Per-doc quantized importance weights: (doc_id, n_toks, weight,
    * score_q) where weight = Σ tf·r_q (see class doc) and
    * score_q = weight div n_toks ∈ [0, scale]. Docs whose text holds no
    * tokens have no unigram evidence and are absent by contract.
    */
  def importanceWeights(docs: DataFrame, isTarget: Column,
      scale: Long = 1000000L, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(scale > 0, s"scale must be positive: $scale")
    val tf = docs
      // a NULL predicate value (e.g. NULL lang) means "not target", not
      // "poison every count it touches": without the coalesce, NULL
      // would ride sum(tf·is_t) into r_q and nullify doc weights
      .select(col(idCol).as("doc_id"),
        coalesce(isTarget.cast("long"), lit(0L)).as("is_t"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term", "is_t")
      .agg(count(lit(1)).as("tf"))
      // persist-once: BOTH the ratio model and the scoring join consume
      // tf — without the cache each branch re-scans and re-tokenizes the
      // corpus (plan-audited: one parquet scan in q140, not four);
      // released after the caller's first action (CacheRelease)
      .persist()
    val ratios = tf
      .groupBy("term")
      .agg(sum(col("tf") * col("is_t")).as("ct"), sum("tf").as("cs"))
      .select(col("term"),
        expr(s"(ct + 1L) * ${scale}L div (cs + 1L)").as("r_q"))
    val out = tf.join(ratios, "term")
      .groupBy("doc_id")
      .agg(sum(col("tf") * col("r_q")).as("weight"),
        sum("tf").as("n_toks"))
      .select(col("doc_id"), col("n_toks"), col("weight"),
        expr("weight div n_toks").as("score_q"))
    graft.util.CacheRelease.afterFirstAction(out, Seq(tf))
  }

  /** Top-k selection by quantized importance (score_q desc, doc_id) —
    * the deterministic "resample the target-most docs" cut. The global
    * top-k is `orderBy(...).limit(k)` — Spark plans it as
    * TakeOrderedAndProject (per-partition bounded heaps merged on the
    * driver, k rows held anywhere, never a global sort or a
    * one-task window); ranks are then a window over the ≤k surviving
    * rows only. Emits the rank so downstream budget cuts compose
    * without re-sorting.
    */
  def selectByImportance(docs: DataFrame, isTarget: Column, k: Int,
      scale: Long = 1000000L, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score_q").desc, col("doc_id"))
    importanceWeights(docs, isTarget, scale, textCol, idCol)
      .orderBy(col("score_q").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
  }
}
