package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: the row-level diff between two versions of
  * a keyed table — what a pipeline inspects after a backfill, a CDC
  * replay, or a rerun whose [[Manifest]] fingerprints disagree (the two
  * operators compose: the manifest says WHICH partition drifted, the
  * diff says WHAT changed in it).
  *
  * One full outer join on the key classifies every row exactly once:
  * key only in `next` → `added`; only in `prev` → `removed`; present in
  * both with any compared column differing → `changed`; identical rows
  * are dropped (the diff of 100 TB against itself is empty, not
  * 100 TB). Column comparison is null-safe (`<=>`), so NULL→value and
  * value→NULL transitions report as `changed` rather than vanishing in
  * three-valued logic.
  *
  * Scale shape: ONE shuffle join on the key, no windows, no driver
  * state; the classification is a map over the joined rows. Skew story,
  * precisely: AQE's OptimizeSkewedJoin cannot split EITHER side of a
  * full-outer join (a split side would duplicate its null-extension
  * rows — ShuffleSkewSpec pins that it declines even under forced
  * confs), so the defense is the unique-key contract itself: with at
  * most one row per key per side no key can fan out, and hash
  * partitioning bounds every partition at ~|keys|/partitions rows
  * whatever the key distribution. Keys must be unique per side
  * (enforced upstream by the usual dedup ops); duplicate keys would
  * fan out the join like any SQL full outer join — garbage in, garbage
  * out, documented not guarded.
  */
object Snapshot {

  def diff(prev: DataFrame, next: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(compareCols.nonEmpty, "need at least one compared column")
    // the presence markers are internal; a user column with either name
    // would be silently clobbered and its drift never reported
    require(!(keyCols ++ compareCols).exists(Set("_p", "_n")),
      "column names _p and _n are reserved by Snapshot.diff")
    val p = prev.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("_p", lit(1))
    val n = next.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("_n", lit(1))
    val joined = p.as("p").join(n.as("n"),
      keyCols.map(k => col(s"p.$k") <=> col(s"n.$k")).reduce(_ && _),
      "full_outer")
    val same = compareCols
      .map(c => col(s"p.$c") <=> col(s"n.$c")).reduce(_ && _)
    val change = when(col("p._p").isNull, "added")
      .when(col("n._n").isNull, "removed")
      .when(!same, "changed")
    joined
      .withColumn("change", change)
      .filter(col("change").isNotNull)
      .select(
        keyCols.map(k => coalesce(col(s"p.$k"), col(s"n.$k")).as(k)) :+
          col("change"): _*)
  }
}
