package graft.util

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Block hygiene for iterative operators built on `localCheckpoint`.
  *
  * `Dataset.unpersist` is a no-op for checkpoint blocks: a
  * localCheckpoint materializes an RDD and wraps it in a `LogicalRDD`,
  * and the blocks are registered on THAT RDD, not on the Dataset's
  * cache entry. An iterative operator that checkpoints per round
  * (connected components, PageRank, BPE merges) must unpersist the
  * underlying RDD explicitly or every round's blocks stay resident
  * until a GC-driven ContextCleaner sweep — a storage-memory leak that
  * compounds with iteration count.
  */
object Checkpoints {

  /** Frees the RDD blocks behind a localCheckpoint'ed Dataset (no-op on
    * plans with no materialized `LogicalRDD`).
    */
  def free(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
