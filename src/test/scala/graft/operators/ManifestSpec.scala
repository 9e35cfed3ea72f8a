package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Output-manifest fingerprints: order/partitioning invariance, change
  * detection, and the documented XOR contracts.
  */
class ManifestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("manifest-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val rows = (0L until 100L)
    .map(i => (i, s"text $i", if (i % 3 == 0) "a" else "b"))

  private def fp(df: org.apache.spark.sql.DataFrame) =
    Manifest.fingerprint(df, Seq("grp"), Seq("doc_id", "text"))
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("invariant under row order and partitioning") {
    val base = fp(rows.toDF("doc_id", "text", "grp"))
    val shuffled = fp(scala.util.Random.shuffle(rows)
      .toDF("doc_id", "text", "grp").repartition(7))
    assert(base == shuffled)
    assert(base.map(_._2).sum == 100L)
  }

  test("a single changed row flips its group's checksum only") {
    val base = fp(rows.toDF("doc_id", "text", "grp"))
    val tampered = fp(rows.map { case (i, t, g) =>
      (i, if (i == 42L) "TAMPERED" else t, g) }.toDF("doc_id", "text", "grp"))
    // 42 % 3 == 0 -> group a changes, group b does not
    assert(base.filter(_._1 == "b") == tampered.filter(_._1 == "b"))
    assert(base.filter(_._1 == "a").head._3 !=
      tampered.filter(_._1 == "a").head._3)
  }

  test("documented contract: replicated rows can keep XOR, count catches it") {
    val base = fp(rows.toDF("doc_id", "text", "grp"))
    val doubled = fp((rows ++ rows ++ rows).toDF("doc_id", "text", "grp"))
    base.zip(doubled).foreach { case ((g1, n1, x1, mn1, mx1),
        (g2, n2, x2, mn2, mx2)) =>
      assert(g1 == g2 && n2 == 3 * n1) // cardinality catches replication
      assert(x1 == x2 && mn1 == mn2 && mx1 == mx2) // xor of 3 copies = 1
    }
  }

  test("NUL separator: shifting a column boundary changes the key") {
    val a = fp(Seq((1L, "ab", "g")).toDF("doc_id", "text", "grp")
      .selectExpr("cast(doc_id as string) as doc_id", "text", "grp")
      .withColumnRenamed("grp", "grp"))
    val b = fp(Seq(("1a", "b", "g")).toDF("doc_id", "text", "grp"))
    assert(a.head._3 != b.head._3)
  }
}
