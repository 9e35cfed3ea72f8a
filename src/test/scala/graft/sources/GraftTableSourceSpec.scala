package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraftTable

/** [[org.apache.spark.sql.graft.GraftTableSource]] — the table format
  * as a streaming SOURCE: a fresh checkpoint serves the full history
  * as change rows (initial snapshot as inserts, then classified
  * changes), and a SECOND run on the SAME checkpoint serves ONLY the
  * versions committed in between — the offset log carries table
  * versions, so restart-resume is exact.
  */
class GraftTableSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-table-source-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Fmt = "org.apache.spark.sql.graft.GraftTableSourceProvider"

  private def freshDir(): String = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_src_").toString
    new java.io.File(d).delete()
    d
  }

  /** AvailableNow run of the feed into a parquet dir via foreachBatch
    * (the memory sink cannot recover from a checkpoint, and
    * checkpointed RESUME is exactly what these tests pin).
    */
  private def runAvailableNow(root: String, ckpt: String,
      outDir: String): Unit = {
    val q = spark.readStream.format(Fmt).option("path", root).load()
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch {
        (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(outDir)
          ()
      }
      .start()
    q.awaitTermination()
  }

  test("fresh checkpoint serves the full change history; same checkpoint resumes at the next version") {
    import spark.implicits._
    val base = freshDir()
    val root = s"$base/table"
    val ckpt = s"$base/ckpt"

    val v0 = GraftTable.create(
      Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
        .toDF("k", "name", "bal"), root)
    val changes = Seq(
      (2L, "b2", 20.0, "U", 1L),
      (3L, "c", 3.0, "D", 1L),
      (4L, "d", 4.0, "I", 1L)).toDF("k", "name", "bal", "op", "seq")
    GraftTable.merge(root, changes, "k", Seq("seq"), v0)

    runAvailableNow(root, ckpt, s"$base/out1")
    val got1 = spark.read.parquet(s"$base/out1")
      .select("k", "name", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(got1 == Set(
      (1L, "a", "insert", 0L),
      (2L, "b", "insert", 0L),
      (3L, "c", "insert", 0L),
      (2L, "b", "update_preimage", 1L),
      (2L, "b2", "update_postimage", 1L),
      (3L, "c", "delete", 1L),
      (4L, "d", "insert", 1L)))

    // commit one more version while the stream is down...
    GraftTable.append(Seq((5L, "e", 5.0)).toDF("k", "name", "bal"),
      root, expectedVersion = 1L)
    // ...and a compaction, which must contribute NOTHING to the feed
    GraftTable.compact(spark, root, expectedVersion = 2L)

    // the SAME checkpoint resumes: only v2's insert arrives (v3 is a
    // compact); nothing from v0/v1 is replayed
    runAvailableNow(root, ckpt, s"$base/out2")
    val got2 = spark.read.parquet(s"$base/out2")
      .select("k", "name", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(got2 == Set((5L, "e", "insert", 2L)))
  }

  test("streaming the feed into an aggregate reconstructs the latest snapshot incrementally") {
    import spark.implicits._
    val base = freshDir()
    val root = s"$base/table"

    val v0 = GraftTable.create(
      (1L to 50L).map(i => (i, i * 10.0)).toDF("k", "v"), root)
    val changes = ((1L to 50L).filter(_ % 7 == 0)
      .map(k => (k, 0.0, "D", 1L)) ++
      (1L to 50L).filter(k => k % 7 != 0 && k % 5 == 0)
        .map(k => (k, k * 100.0, "U", 1L)) ++
      Seq((99L, 990.0, "I", 1L)))
      .toDF("k", "v", "op", "seq")
    GraftTable.merge(root, changes, "k", Seq("seq"), v0)

    // replay the feed in _commit_version order: latest non-delete image
    // per key = the snapshot (the downstream-materialization contract)
    runAvailableNow(root, s"$base/ckpt", s"$base/out3")
    val replayed = spark.read.parquet(s"$base/out3")
      .filter(col("_change_type") =!= lit("update_preimage"))
      .groupBy("k")
      .agg(max(struct(col("_commit_version"), col("_change_type"),
        col("v"))).as("w"))
      .filter(col("w._change_type") =!= lit("delete"))
      .select(col("k"), col("w.v").as("v"))
      .as[(Long, Double)].collect().toSet
    val snapshot = GraftTable.read(spark, root)
      .as[(Long, Double)].collect().toSet
    assert(replayed == snapshot)
  }

  test("streaming from a missing table fails loudly") {
    val e = intercept[Exception] {
      spark.readStream.format(Fmt)
        .option("path", s"${freshDir()}/nope").load()
    }
    assert(e.getMessage.contains("no committed versions"))
  }
}
