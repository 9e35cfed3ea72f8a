package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range-clustered parquet layout for zone-map data skipping — the
  * write-side half of predicate pushdown. Parquet keeps min/max
  * statistics per row group; a filter on a column can skip a whole row
  * group only when the column's values are CLUSTERED, so the same scan
  * that reads everything on a randomly-laid-out table reads almost
  * nothing after a range-partitioned, sorted write. At 100 TB this is
  * the difference between a full-corpus scan and touching a handful of
  * files per point/range lookup on the cluster key — no index service
  * required, just layout.
  *
  * `repartitionByRange` gives non-overlapping key ranges ACROSS files
  * (so file-level min/max prune first), `sortWithinPartitions` orders
  * ranges WITHIN each file (so row-group min/max prune next), and a
  * bounded `parquet.block.size` keeps row groups small enough that
  * pruning has granularity to work with. The write itself is one range
  * shuffle — the standard one-off cost of laying out a table for its
  * dominant access path.
  */
object ClusteredWrite {

  def write(df: DataFrame, path: String, sortCols: Seq[String],
      rowGroupBytes: Long = 128L * 1024 * 1024, numFiles: Int = 0): Unit = {
    val ranged =
      if (numFiles > 0) df.repartitionByRange(numFiles, sortCols.map(col): _*)
      else df.repartitionByRange(sortCols.map(col): _*)
    ranged
      .sortWithinPartitions(sortCols.map(col): _*)
      .write
      .option("parquet.block.size", rowGroupBytes.toString)
      .mode("overwrite")
      .parquet(path)
  }

  /** Morton (Z-order) interleave of two bucketized non-negative ints:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Unrolled
    * into a codegen'd OR-chain of shift/mask terms — `bits` ≤ 31 keeps
    * the result inside a positive long.
    */
  def mortonKey(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(a.cast("long").bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(b.cast("long").bitwiseAND(lit(1L << i)), i + 1))
    }

  /** Map a numeric column into `[0, 2^bits)` buckets over `[lo, hi]` —
    * the quantization step before Morton interleaving. Values at/above
    * `hi` clamp into the top bucket, at/below `lo` into bucket 0.
    */
  def bucketize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val n = 1L << bits
    least(lit(n - 1), greatest(lit(0L),
      floor((c.cast("double") - lo) / ((hi - lo) / n)).cast("long")))
  }

  /** Z-order-clustered parquet layout: rows are range-partitioned and
    * sorted by the Morton interleave of TWO bucketized columns, so each
    * file/row group covers a small RECTANGLE in (a, b) space rather than
    * a slab in one dimension. Parquet min/max stats on the raw columns
    * then prune selective filters on EITHER column — the multi-dimensional
    * upgrade of [[write]], whose linear sort only skips on its leading
    * key. Bucket bounds come from one tiny min/max agg over the input
    * (at production scale they'd come from table statistics); the z-key
    * itself is dropped before the write, the layout is the index.
    */
  def writeZOrder(df: DataFrame, path: String, colA: String, colB: String,
      bits: Int = 8, rowGroupBytes: Long = 128L * 1024 * 1024,
      numFiles: Int = 0): Unit = {
    val Array(loA, hiA, loB, hiB) = df
      .agg(min(col(colA)).cast("double"), max(col(colA)).cast("double"),
        min(col(colB)).cast("double"), max(col(colB)).cast("double"))
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    val z = mortonKey(
      bucketize(col(colA), loA, math.nextUp(hiA), bits),
      bucketize(col(colB), loB, math.nextUp(hiB), bits), bits)
    val keyed = df.withColumn("__zkey", z)
    val ranged =
      if (numFiles > 0) keyed.repartitionByRange(numFiles, col("__zkey"))
      else keyed.repartitionByRange(col("__zkey"))
    ranged
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write
      .option("parquet.block.size", rowGroupBytes.toString)
      .mode("overwrite")
      .parquet(path)
  }
}
