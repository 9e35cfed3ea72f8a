package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-prefiltered join: the manual form of runtime row-level filtering
  * (semi-join reduction) for a fact⋈filtered-dim join.
  *
  * A Bloom filter is built over the build side's join keys (the build side
  * is the already-filtered dimension — small by contract), broadcast to
  * every task, and used to drop probe-side rows BEFORE they reach the
  * shuffle. At 100 TB the probe (fact) side dominates join cost: rows that
  * cannot match are hashed, serialized, shuffled, and spilled for nothing.
  * A few-MB filter at fpp ~1% removes ≥99% of them at scan time, after
  * which only the ~matching sliver shuffles.
  *
  * Bloom filters have NO false negatives, so the result is exactly the
  * plain join — which is what the q131 oracle checks (its SQL is the
  * unfiltered join). False positives only cost a wasted shuffle row and
  * are eliminated by the join itself.
  *
  * Like [[Curation.sizedBloom]], the filter is sized from the build side:
  * `expectedItems <= 0` derives it from `build.count()` — one cheap action
  * on the SMALL side. Undersizing would push fpp toward 1 and silently
  * degrade the plan to the plain join plus a useless double scan.
  */
object BloomJoin {

  /** The reduction alone: `probe` rows whose `probeKey` might be in the
    * build side's key set. Exposed separately so callers can observe the
    * reduction (and so the q131 require can assert the filter actually
    * filtered) before paying for the join.
    */
  def prefilterProbe(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long = -1L,
      fpp: Double = 0.01): DataFrame = {
    val spark = probe.sparkSession
    val items =
      if (expectedItems > 0) expectedItems
      else math.max(build.count(), 1L)
    val bloom = build.stat.bloomFilter(buildKey, items, fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    // A plain Scala UDF over the broadcast filter: the per-row cost is one
    // murmur pass over 8 bytes — negligible next to the shuffle write it
    // saves. (Spark's native might_contain expression is not in the public
    // FunctionRegistry, so the UDF is the supported route.)
    val contains = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    probe.filter(contains(col(probeKey)))
  }

  /** Inner-join `probe` with `build` on `probeKey == buildKey`, pre-filtering
    * the probe side through a Bloom filter of the build side's keys.
    */
  def prefilteredJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long = -1L,
      fpp: Double = 0.01): DataFrame =
    prefilterProbe(probe, build, probeKey, buildKey, expectedItems, fpp)
      .join(build, col(probeKey) === col(buildKey))
}
