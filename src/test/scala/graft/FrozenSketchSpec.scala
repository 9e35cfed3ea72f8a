package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Reproducibility gate for the frozen sketch-estimate pins
  * (`queries/FrozenSketchSql`, round 13): re-run q14/q51/q147 live
  * under the canonical Verify session config (local[4], 4 shuffle
  * partitions — the layout the driver's correctness gate uses) and
  * compare against the committed frozen literals. HLL estimates are
  * layout-independent (commutative register-max merge); the GK
  * percentile sketch is layout-SENSITIVE (a local[8] probe produced
  * different p25 values), so this spec is the canary that the pins
  * stay reproducible under the one config that matters — it fails
  * loudly on a Spark-internals change, a fixture regeneration, or a
  * session-config drift, before the driver's hash compare does.
  */
class FrozenSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("frozen-sketch-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.01"

  private def fixture = new java.io.File(sf).exists()

  test("q14: live HLL++ estimates equal the frozen pins") {
    assume(fixture, "sf0.01 fixture not present")
    val sql = queries.FrozenSketchSql.q14
    val frozen = "\\('([^']*)', ([0-9]+)\\)".r.findAllMatchIn(sql)
      .map(m => (m.group(1), m.group(2).toLong)).toSeq
    assert(frozen.size == 5, s"expected 5 frozen rows: $frozen")
    val live = SparkEntry.queries("q14_approx_distinct")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(live == frozen,
      s"HLL++ estimates drifted from the committed pins: $live vs $frozen")
  }

  test("q51: live GK estimates equal the frozen pins under the Verify layout") {
    assume(fixture, "sf0.01 fixture not present")
    val sql = queries.FrozenSketchSql.q51
    val frozen = "\\('([^']*)', ([0-9.]+), ([0-9.]+), ([0-9.]+)\\)".r
      .findAllMatchIn(sql)
      .map(m => (m.group(1), m.group(2).toDouble, m.group(3).toDouble,
        m.group(4).toDouble)).toSeq
    assert(frozen.size == 3, s"expected 3 frozen rows: $frozen")
    val live = SparkEntry.queries("q51_approx_percentile")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(3),
        r.getDouble(5))).toSeq
    assert(live == frozen,
      s"GK estimates drifted from the committed pins: $live vs $frozen")
  }

  test("q147: live DataSketches HLL estimates equal the frozen pins") {
    assume(fixture, "sf0.01 fixture not present")
    val sql = queries.FrozenSketchSql.q147
    val frozen = "\\('([^']*)', ([0-9]+), ([0-9]+)\\)".r.findAllMatchIn(sql)
      .map(m => (m.group(1), m.group(2).toLong, m.group(3).toLong)).toSeq
    assert(frozen.size == 20, s"expected 20 frozen rows, got ${frozen.size}")
    val live = SparkEntry.queries("q147_hll_distinct_sketch")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSeq
    assert(live == frozen,
      s"HLL estimates drifted from the committed pins: $live vs $frozen")
  }
}
