package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Compression-signal checks: repetitive text compresses far below
  * high-entropy text, the permille arithmetic is exact, and the
  * operator is deterministic across runs.
  */
class CompressionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("compression-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("repetitive text compresses far below mixed-entropy text") {
    val rep = Seq.fill(200)("the same phrase again").mkString(" ")
    val rnd = new scala.util.Random(11)
    val noisy = Seq.fill(200)(rnd.alphanumeric.take(20).mkString).mkString(" ")
    val docs = Seq((1L, rep), (2L, noisy), (3L, ""), (4L, null: String))
      .toDF("doc_id", "text")
    val got = TextAnalysis.compressionStats(docs)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

    val (_, repBytes, repComp, repPm) = got(1L)
    val (_, noisyBytes, _, noisyPm) = got(2L)
    assert(repBytes == rep.getBytes("UTF-8").length.toLong)
    assert(repPm == 1000L * repComp / repBytes)
    assert(repPm < 100, s"boilerplate should crush: $repPm")
    assert(noisyPm > 500, s"high-entropy should resist: $noisyPm")
    assert(noisyBytes > 0)
    // empty/null docs: defined, flagged incompressible
    assert(got(3L)._4 == 1000L && got(4L)._4 == 1000L)
  }

  test("deterministic across runs") {
    val docs = Seq((1L, "alpha beta gamma alpha beta")).toDF("doc_id", "text")
    val a = TextAnalysis.compressionStats(docs).collect().toSeq
    val b = TextAnalysis.compressionStats(docs).collect().toSeq
    assert(a == b)
  }
}
