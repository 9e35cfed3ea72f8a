package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus term weighting and ranked retrieval: TF-IDF per-document term
  * scoring and BM25 keyword search over a document table — the indexing
  * primitives an LLM-data pipeline uses for quality-aware filtering and
  * benchmark-style retrieval (reference scope: the similarity scoring in
  * evaluate_dirt.py ranks by corpus statistics the same way).
  *
  * Scale shape: `termFreqs` is one shuffle on (doc, term) with map-side
  * partial counts; `docFreqs` reuses those already-distinct (doc, term)
  * rows, so df is a second partial-agg shuffle over vocabulary-sized
  * data. The tf⋈df join shuffles on `term` — the vocabulary of a 100 TB
  * corpus is far past broadcast range, but it is Zipf-skewed, which AQE's
  * skew-join split handles at runtime; nothing here collects to the
  * driver except the corpus size N (a scalar, same class as the DIRT
  * pipeline's global N). Top-k per doc is a bounded window over the
  * doc-partitioned join output. The skew claim is pinned by
  * `TfIdfSkewSpec`: with broadcast disabled (the at-scale join shape)
  * and the AQE thresholds scaled to fixture bytes, a Zipf-hot term
  * demonstrably trips OptimizeSkewedJoin's split — at production
  * defaults the 256 MB skewed-partition threshold needs real-cluster
  * shuffle sizes, which no in-repo fixture can reach, so the full-size
  * bench carries no skew entry by design.
  *
  * Cross-engine exactness: the oracled rankings deliberately use the
  * log-free inverse-frequency idf variant (`tf/df`, and BM25 with a
  * rational idf). Every arithmetic op involved (+, -, *, /) is an IEEE
  * 754 basic operation — correctly rounded, so Spark and DuckDB produce
  * bit-identical doubles from identical integer inputs and identical
  * expression trees. `ln` is NOT correctly rounded (Java Math.log and
  * libm disagree in ~1/1000 values at the last ulp — measured, 4/5000 on
  * this corpus's idf domain), so the classic `tf·ln(N/df)` score is
  * offered for users ([[topTermsLogIdf]]) but pinned by closed-form unit
  * tests rather than a cross-engine oracle.
  */
object TfIdf {

  /** (doc_id, term, tf): whitespace tokens, lowercased. One row per
    * distinct term per doc. */
  def termFreqs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))

  /** (term, df): number of docs containing each term. Reuses the
    * (doc, term)-distinct tf rows, so this is a plain partial-agg count —
    * no second pass over the corpus text. */
  def docFreqs(tf: DataFrame): DataFrame =
    tf.groupBy("term").agg(count(lit(1)).as("df"))

  /** (doc_id, term, tf, df) — the exact sufficient statistics of any
    * tf-idf variant, joined on term. */
  def termStats(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val tf = termFreqs(docs, textCol, idCol)
    tf.join(docFreqs(tf), "term").select("doc_id", "term", "tf", "df")
  }

  /** Top-k terms per doc ranked by inverse-frequency weight tf/df
    * (descending; term name breaks exact ties). Output columns are all
    * integers — (doc_id, term, tf, df, rank) — so the oracle compare
    * never hashes a float. */
  def topTerms(docs: DataFrame, k: Int, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val score = col("tf").cast("double") / col("df").cast("double")
    val w = Window.partitionBy("doc_id").orderBy(score.desc, col("term"))
    termStats(docs, textCol, idCol)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Classic tf·ln(N/df) scores (not oracled — see the class doc).
    *
    * N enters the plan as a broadcast 1-row aggregate cross-joined onto
    * the term stats, NOT as a driver-side `docs.count()` — constructing
    * this DataFrame triggers no job (spec-asserted), so the operator
    * composes lazily like every other one (the round-6 `blocklistFilter`
    * lesson: an eager scalar in a builder turns plan construction into
    * execution and re-fires per consumer).
    */
  def topTermsLogIdf(docs: DataFrame, k: Int, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val score = col("tf") * log(col("n_docs") / col("df"))
    val w = Window.partitionBy("doc_id").orderBy(score.desc, col("term"))
    termStats(docs, textCol, idCol)
      .crossJoin(broadcast(n))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .drop("n_docs")
  }

  /** BM25 ranked retrieval for a fixed bag of query terms.
    *
    * Per-term contribution (Robertson/Lucene shape, with the rational
    * idf variant `(N - df + 0.5)/(df + 0.5)` instead of its log for
    * cross-engine exactness):
    *
    *   idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·(dl/avgdl)))
    *
    * The per-doc total is formed by adding the per-term contributions in
    * the FIXED order of `terms` (conditional-sum pivot, then an explicit
    * left-to-right `+` chain) — a plain SUM over a float column has no
    * deterministic addition order across engines, and float addition is
    * not associative. `dl` is the doc's token count, `avgdl` the exact
    * integer token total divided once by N.
    *
    * Returns top-k (doc_id, rank, score) by (score desc, doc_id). The
    * score is the raw double — bit-identical cross-engine per the class
    * doc; callers that hash-compare results should floor-quantize it
    * (`floor(score * 1e4)`) rather than `round`, whose half-up decision
    * differs between engines at decimal boundaries.
    */
  def bm25(docs: DataFrame, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val docLens = docs.select(col(idCol).as("doc_id"),
      size(toks).cast("long").as("dl"))
    // exact scalars: integer token total / N, one driver-side row
    val Seq(nDocs, totalTokens) = {
      val r = docLens.agg(count(lit(1)), sum("dl")).head()
      Seq(r.getLong(0), r.getLong(1))
    }
    val avgdl = totalTokens.toDouble / nDocs.toDouble

    // the term filter pushes below the tf aggregation (filter on a group
    // key), and df-per-term only depends on that term's own rows, so
    // deriving df from the filtered tf is exact — one corpus scan total
    val tf = termFreqs(docs, textCol, idCol)
      .filter(col("term").isin(terms: _*))
    val df = docFreqs(tf)
    val scored = tf.join(broadcast(df), "term") // |terms| rows — broadcast
      .join(docLens, "doc_id")
      .withColumn("contrib",
        ((lit(nDocs.toDouble) - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) *
          ((col("tf") * lit(k1 + 1.0)) /
            (col("tf") + lit(k1) *
              (lit(1.0 - b) + lit(b) * (col("dl") / lit(avgdl))))))

    // fixed-order pivot: one column per query term, added left-to-right
    // (a term absent from a doc contributes exactly +0.0)
    val aggCols = terms.map(t =>
      sum(when(col("term") === t, col("contrib")).otherwise(lit(0.0)))
        .as(s"c_$t"))
    val pivoted = scored.groupBy("doc_id").agg(aggCols.head, aggCols.tail: _*)
    val total = terms.map(t => col(s"c_$t")).reduceLeft(_ + _)
    // top-k via sort+limit = TakeOrderedAndProject (distributed heap
    // top-k, no global sort / single-partition window); the rank window
    // then runs over k rows only.
    val topK = pivoted
      .withColumn("score", total)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    topK
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast("long"))
      .select("doc_id", "rank", "score")
  }
}
