package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, the
  * engine-native `hll_sketch_agg` family) for incremental corpus
  * statistics: per-source distinct (doc, term) incidence — the
  * vocabulary-coverage metric a manifest carries per ingest batch.
  *
  * Why a sketch column and not `count(distinct ...)`: at 100 TB the
  * incidence set is trillions of pairs; the exact count is a full
  * shuffle of every pair, and — worse — it cannot be maintained across
  * ingest batches without re-scanning the union. An HLL sketch is a
  * fixed ~2^lgK-byte register array whose union is register-wise max,
  * so each ingest batch ships ONE sketch row per source and the
  * corpus-lifetime estimate is `hll_union_agg` over batch sketches —
  * the same merge shape as [[Manifest]]'s XOR fingerprint, with partial
  * aggregation doing the map-side combine for free.
  *
  * [[bySource]] computes both paths over the fixture — the one-shot
  * whole-corpus sketch and the union of two disjoint ingest-half
  * sketches (doc_id parity) — alongside the exact count, so a caller
  * (q147) can gate: both estimates within the published HLL error band
  * of exact, and within the band of EACH OTHER. Equality is not
  * required by design: DataSketches uses the HIP estimator on a
  * straight-built sketch and the composite estimator after a union, so
  * the two paths agree only statistically even over identical sets.
  */
object DistinctSketch {

  /** Relative standard deviation of an HLL sketch with `lgK` register
    * bits (Flajolet et al. 2007: 1.04 / sqrt(2^lgK)).
    */
  def rsd(lgK: Int): Double = 1.04 / math.sqrt((1L << lgK).toDouble)

  /** Per source: exact distinct (doc_id, term) incidence count, the
    * one-shot sketch estimate, and the estimate from unioning two
    * disjoint ingest-half sketches. Output:
    * `(source, n_exact, est_whole, est_merged)`, one row per source.
    */
  def bySource(docs: DataFrame, lgK: Int = 12,
      textCol: String = "text", idCol: String = "doc_id",
      srcCol: String = "source"): DataFrame = {
    val items = docs
      .select(col(srcCol).as("source"), col(idCol).as("doc_id"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .select(col("source"), col("doc_id"),
        concat_ws(":", col("doc_id"), col("term")).as("item"))

    val whole = items.groupBy("source").agg(
      countDistinct(col("item")).as("n_exact"),
      hll_sketch_estimate(hll_sketch_agg(col("item"), lit(lgK)))
        .as("est_whole"))

    // two disjoint ingest batches by doc parity: one sketch row per
    // (source, batch) leaves the executors; the union is register-max
    val merged = items
      .withColumn("batch", pmod(col("doc_id"), lit(2)))
      .groupBy("source", "batch")
      .agg(hll_sketch_agg(col("item"), lit(lgK)).as("sk"))
      .groupBy("source")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_merged"))

    // anchor on the source dimension itself: a source whose docs are all
    // empty/whitespace contributes no item rows, and an inner join would
    // silently drop it from the manifest statistic — it must instead
    // report 0 distinct items (ADVICE r10)
    docs.select(col(srcCol).as("source")).distinct()
      .join(whole, Seq("source"), "left")
      .join(merged, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        coalesce(col("est_whole"), lit(0.0)).as("est_whole"),
        coalesce(col("est_merged"), lit(0.0)).as("est_merged"))
  }
}
