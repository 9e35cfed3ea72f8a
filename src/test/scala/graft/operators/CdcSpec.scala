package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed MERGE semantics for [[Cdc.latestWinsMerge]]: upsert
  * wins by (ts, tiebreak), deletes remove, unseen keys insert, keys
  * without changes pass through — and the answer is independent of
  * changelog row order (the struct-max reduction is commutative).
  */
class CdcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("cdc-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val base = Seq(
    (1L, "alice", 10.0),
    (2L, "bob", 20.0),
    (3L, "carol", 30.0),
    (4L, "dave", 40.0)).toDF("k", "name", "bal")

  // per key: 1 → two updates (later wins), 2 → update then delete,
  // 3 → untouched, 4 → delete then REINSERT (later wins), 5 → pure insert
  private val changes = Seq(
    (1L, "alice2", 11.0, 1L, 1L, "U"),
    (1L, "alice3", 12.0, 2L, 2L, "U"),
    (2L, "bob2", 21.0, 1L, 3L, "U"),
    (2L, "bob2", 21.0, 2L, 4L, "D"),
    (4L, "dave", 40.0, 1L, 5L, "D"),
    (4L, "dave2", 44.0, 2L, 6L, "I"),
    (5L, "erin", 50.0, 1L, 7L, "I"))
    .toDF("k", "name", "bal", "ts", "tieb", "op")

  private val expected = Set(
    (1L, "alice3", 12.0), // latest update wins
    (3L, "carol", 30.0),  // untouched passthrough
    (4L, "dave2", 44.0),  // delete superseded by reinsert
    (5L, "erin", 50.0))   // insert of an unseen key

  test("latest-wins merge: upsert/delete/insert/passthrough") {
    val got = Cdc.latestWinsMerge(base, changes, "k", Seq("ts", "tieb"))
      .as[(Long, String, Double)].collect().toSet
    assert(got == expected)
  }

  test("result is independent of changelog row order and partitioning") {
    val shuffled = changes.orderBy($"tieb".desc).repartition(7)
    val got = Cdc.latestWinsMerge(base, shuffled, "k", Seq("ts", "tieb"))
      .as[(Long, String, Double)].collect().toSet
    assert(got == expected)
  }

  test("same-ts changes resolve by the tiebreaker") {
    val ties = Seq(
      (1L, "first", 1.0, 1L, 1L, "U"),
      (1L, "last", 2.0, 1L, 2L, "U")).toDF("k", "name", "bal", "ts", "tieb", "op")
    val got = Cdc.latestWinsMerge(base.filter($"k" === 1), ties, "k",
      Seq("ts", "tieb")).as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "last", 2.0)))
  }
}
