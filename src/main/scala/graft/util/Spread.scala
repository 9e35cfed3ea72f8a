package graft.util

import org.apache.spark.sql.{DataFrame, Dataset}

/** Scan-parallelism floor for CPU-bound per-row stages (optimization
  * guide §2.5 "input skew" / §6 `spark.sql.files.minPartitionNum`).
  *
  * A small parquet table is one file with one row group, and one row
  * group is one scan task — so every per-row-expensive stage fed
  * directly by such a scan (image/GIF/JPEG codec work, HTML parsing,
  * MinHash signatures, edit distance) runs on ONE core of the cluster.
  * Measured on the 32-core bench this serialization, not the codec
  * itself, dominated the multimodal entries (q145: ~10 s of ImageIO
  * work in one task).
  *
  * [[cpuBound]] fans the rows out to the cluster's default parallelism
  * with a round-robin exchange BEFORE the expensive stage — and is a
  * structural no-op whenever the input already carries at least that
  * many partitions, so on a real many-partition table (the 100 TB
  * case) no exchange is added. The exchanged rows are the operator's
  * narrow INPUTS (ids, text), never generated payloads, so the moved
  * bytes are bounded by the input the scan read.
  *
  * Only apply this to exchange-free plans (scan/project/filter/union):
  * inspecting the partition count of a plan that already contains an
  * exchange can trigger partial execution under AQE.
  */
object Spread {

  /** `df` repartitioned up to the cluster's default parallelism when its
    * current scan parallelism is below it; unchanged otherwise.
    */
  def cpuBound(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** [[cpuBound]] for typed Datasets. */
  def cpuBoundDs[T](ds: Dataset[T]): Dataset[T] = {
    val target = ds.sparkSession.sparkContext.defaultParallelism
    if (ds.rdd.getNumPartitions >= target) ds else ds.repartition(target)
  }
}
