package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.LongAdder

/** Memory-pressure probe: runs the heavy query family under a
  * deliberately small heap (set `SPARK_DRIVER_MEM`, e.g. `4g`) and
  * reports, per query, wall seconds plus the executor task metrics that
  * distinguish "spilled and survived" from "fit comfortably":
  * `memoryBytesSpilled` / `diskBytesSpilled` (execution memory pressure
  * handled by spill) and max `peakExecutionMemory` per task. One JSON
  * line on stdout, same transport as Bench.
  *
  * This is the 100 TB operability claim made falsifiable at fixture
  * scale: a 1000-executor cluster never gives an operator the luxury of
  * a heap sized to its input, so the heavy operators must degrade to
  * spill — not OOM — when execution memory is scarce. A query that OOMs
  * here lands in `errors` and fails the run (exit 1).
  *
  * Usage: `SPARK_DRIVER_MEM=4g SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  * sbt "runMain graft.MemoryPressure [queryName ...]"`
  */
object MemoryPressure {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q32_dedup_jaccard", "q68_dedup_components",
        "q78_curate_corpus_pipeline", "q110_fuzzy_join_editdist",
        "q114_bpe_encode")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val memSpilled = new LongAdder
    val diskSpilled = new LongAdder
    val peakExec = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          memSpilled.add(m.memoryBytesSpilled)
          diskSpilled.add(m.diskBytesSpilled)
          peakExec.updateAndGet(p => math.max(p, m.peakExecutionMemory))
          ()
        }
      }
    })

    val results = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    names.foreach { name =>
      memSpilled.reset(); diskSpilled.reset(); peakExec.set(0L)
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        results(name) =
          s"""{"sec":$sec,"memoryBytesSpilled":${memSpilled.sum()},""" +
            s""""diskBytesSpilled":${diskSpilled.sum()},""" +
            s""""peakExecutionMemory":${peakExec.get()}}"""
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(1).mkString.take(200)
            .replace("\\", "\\\\").replace("\"", "\\\"")
      } finally spark.catalog.clearCache()
    }

    val heapMax = Runtime.getRuntime.maxMemory()
    val qs = results.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s""""$k":"$v"""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"memory_pressure","heapMaxBytes":$heapMax,""" +
      s""""cpus":$cpus,"sf":"$sfDir","queries":$qs,"errors":$es}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
