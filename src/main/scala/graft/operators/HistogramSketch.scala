package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-bin histogram quantiles: the mergeable-sketch way to compute
  * percentiles over 100 TB without a global sort.
  *
  * One map-side-combined `groupBy(bin)` reduces the corpus to at most
  * `nBins` count rows (a few KB regardless of input size — the partial
  * aggregation IS the sketch merge), after which the cumulative walk and
  * the quantile pick run over those `nBins` rows only. The estimate is
  * the matching bin's LOWER edge, so the error is bounded by one bin
  * width — a guarantee the q134 require checks against the exact
  * percentile on the same scan.
  *
  * Everything except the final edge multiplication is integer arithmetic
  * (permille quantiles, ceil division), and the edge is `bin * width`
  * with a literal width — so a SQL engine replays the identical result
  * bit-for-bit (q134's DuckDB twin).
  *
  * Unlike `percentile_approx` (Greenwald–Khanna, rank-error bound,
  * engine-specific sketch) this trades a declared VALUE-error bound
  * (`(hi-lo)/nBins`) for cross-engine reproducibility and trivial
  * mergeability.
  */
object HistogramSketch {

  /** Per-quantile rows `(q_permille, bin, est)` for `valueCol` clamped to
    * `[lo, hi)` under `nBins` equal-width bins.
    */
  def quantiles(df: DataFrame, valueCol: String, lo: Double, hi: Double,
      nBins: Int, qsPermille: Seq[Int]): DataFrame = {
    require(nBins > 0 && hi > lo, s"bad bin spec: [$lo,$hi) x $nBins")
    require(qsPermille.nonEmpty && qsPermille.forall(q => q > 0 && q <= 1000),
      s"quantiles must be permille in (0,1000]: $qsPermille")
    val spark = df.sparkSession
    import spark.implicits._
    val w = (hi - lo) / nBins

    val hist = df
      .select(least(greatest(
          floor((col(valueCol) - lit(lo)) / lit(w)), lit(0L)),
          lit((nBins - 1).toLong))
        .cast("long").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"))

    val total = hist.agg(sum("n").cast("long").as("total"))
    // unpartitioned window over <= nBins aggregated rows — bounded by
    // contract, never over the corpus
    val cumW = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .crossJoin(broadcast(total))
      .withColumn("cum", sum("n").over(cumW).cast("long"))

    val qs = qsPermille.toDF("q_permille")
    qs.join(cum,
        col("cum") >= expr("(total * q_permille + 999) DIV 1000"))
      .groupBy("q_permille")
      .agg(min("bin").as("bin"))
      .withColumn("est", round(lit(lo) + col("bin") * lit(w), 6))
  }
}
