package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for Zipfian keys (SURVEY.md §4, §7.5.6): when one key
  * dominates (`have`, `be in`… for DIRT paths; hot users for events), a
  * plain shuffle join lands the whole hot key in one task. Salting splits
  * the big side's rows across `saltFactor` sub-keys and replicates the
  * small side once per salt, so the hot key fans out over `saltFactor`
  * tasks.
  *
  * AQE's skew-join handles most of this automatically for sort-merge
  * joins; this operator is for the cases AQE can't touch (aggregations
  * after the join keyed on the hot key, or deliberate pre-partitioning).
  */
object SkewJoin {

  /** Inner equi-join `big ⋈ small` on `keys`, salted: big rows get a
    * deterministic salt, small rows are replicated across every salt
    * value. Result is row-identical to the unsalted join.
    *
    * The salt hashes the `uniquifier` column when the caller has one (a
    * row id, an event id) — a hot key whose rows are fully identical
    * still spreads. Without a uniquifier it falls back to hashing the
    * whole row, which spreads hot keys of *distinct* rows but necessarily
    * lands identical duplicate rows in one salt bucket (documented
    * caveat: deterministic salting cannot separate indistinguishable
    * rows; pass a uniquifier or deduplicate first).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFactor: Int = 16,
      uniquifier: Option[String] = None): DataFrame = {
    require(saltFactor > 0)
    // deterministic per-row salt: spreads each key's rows without RNG
    // (keeps retries/speculative tasks consistent)
    val saltSource = uniquifier match {
      case Some(c) => Seq(col(c))
      case None    => big.columns.toIndexedSeq.map(col)
    }
    val salted = big.withColumn("__salt",
      pmod(hash(saltSource: _*), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted
      .join(replicated, keys :+ "__salt")
      .drop("__salt")
  }

  /** Salted aggregation: two-phase groupBy for hot grouping keys — a
    * partial count+sum per (keys, salt), then the final merge on keys.
    * Emits `n_rows` plus `sum_<c>` for every column in `sumCols`; result
    * equals the direct groupBy, with the hot key's partial work spread
    * over `saltFactor` tasks. (Catalyst's partial aggregation already
    * does this for algebraic aggs; this shape forces the split when a
    * downstream stage must stay keyed on the hot key.)
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      sumCols: Seq[String],
      saltFactor: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(saltFactor)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__n"),
        sumCols.map(c => sum(col(c)).as(s"__sum_$c")): _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum("__n").as("n_rows"),
        sumCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")): _*)
  }
}
