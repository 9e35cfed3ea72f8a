package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

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
}
