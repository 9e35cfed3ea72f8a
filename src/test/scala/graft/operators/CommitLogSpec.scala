package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The transactional contract of [[GraftTable]]: snapshot isolation
  * (torn/abandoned stages invisible), time-travel stability, the
  * rename-CAS conflict path, ACID MERGE semantics via the Cdc kernel,
  * and vacuum never touching committed data.
  */
class CommitLogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("commit-log-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshRoot(): String = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_table_").toString
    new java.io.File(d).delete()
    d
  }

  private def table3(rows: Seq[(Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("k", "name", "bal")
  }

  test("create/read roundtrip and history") {
    val root = freshRoot()
    val v0 = GraftTable.create(
      table3(Seq((1L, "a", 1.0), (2L, "b", 2.0))), root)
    assert(v0 == 0L)
    assert(GraftTable.latestVersion(spark, root) == 0L)
    val got = GraftTable.read(spark, root)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "a"), (2L, "b")))
    val h = GraftTable.history(spark, root)
    assert(h.map(c => (c.version, c.parent, c.op)) ==
      Seq((0L, -1L, "CREATE")))
    assert(h.head.files.nonEmpty)
  }

  test("append carries parent files; merge rewrites; time travel is stable") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(table3(Seq((1L, "a", 1.0), (2L, "b", 2.0))), root)
    GraftTable.append(table3(Seq((3L, "c", 3.0))), root,
      expectedVersion = 0L)
    assert(GraftTable.read(spark, root).count() == 3L)
    // v1 carries v0's files plus its own — nothing rewritten
    val h = GraftTable.history(spark, root)
    assert(h(0).files.toSet.subsetOf(h(1).files.toSet))

    val changes = Seq(
      (2L, "b2", 20.0, "U", 1L),
      (3L, "c", 3.0, "D", 1L),
      (4L, "d", 4.0, "I", 1L))
      .toDF("k", "name", "bal", "op", "seq")
    GraftTable.merge(root, changes, key = "k", ordering = Seq("seq"),
      expectedVersion = 1L)
    val v2 = GraftTable.read(spark, root).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(v2 == Seq((1L, "a"), (2L, "b2"), (4L, "d")))
    // time travel: v0 and v1 still read exactly as committed
    assert(GraftTable.readVersion(spark, root, 0L).count() == 2L)
    val v1 = GraftTable.readVersion(spark, root, 1L).orderBy("k")
      .collect().map(_.getLong(0)).toSeq
    assert(v1 == Seq(1L, 2L, 3L))
  }

  test("torn commit is invisible: staged data without a manifest is never read") {
    val root = freshRoot()
    GraftTable.create(table3(Seq((1L, "a", 1.0))), root)
    // simulate a writer that crashed after staging data, before
    // publishing the manifest
    table3(Seq((99L, "torn", 9.0))).write
      .parquet(s"$root/data/v00000001-deadbeef")
    assert(GraftTable.latestVersion(spark, root) == 0L)
    assert(GraftTable.read(spark, root).count() == 1L)
    // vacuum removes exactly the orphan, and the table still reads
    val deleted = GraftTable.vacuum(spark, root)
    assert(deleted == Seq("v00000001-deadbeef"))
    assert(GraftTable.read(spark, root).count() == 1L)
    assert(GraftTable.vacuum(spark, root).isEmpty)
  }

  test("stale expectedVersion conflicts; retry against the new latest succeeds") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(table3(Seq((1L, "a", 1.0), (2L, "b", 2.0))), root)
    val changesA = Seq((1L, "a2", 10.0, "U", 1L))
      .toDF("k", "name", "bal", "op", "seq")
    val changesB = Seq((2L, "b", 2.0, "D", 1L))
      .toDF("k", "name", "bal", "op", "seq")
    assert(GraftTable.merge(root, changesA, "k", Seq("seq"), 0L) == 1L)
    // writer B still believes latest is 0 — lost-update attempt
    val e = intercept[GraftTable.ConflictException] {
      GraftTable.merge(root, changesB, "k", Seq("seq"), 0L)
    }
    assert(e.expected == 0L && e.actual == 1L)
    // B's data was not published
    assert(GraftTable.read(spark, root).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a2"), (2L, "b")))
    // retry against the observed latest wins
    assert(GraftTable.merge(root, changesB, "k", Seq("seq"), 1L) == 2L)
    assert(GraftTable.read(spark, root).collect().map(_.getLong(0)).toSeq
      == Seq(1L))
  }

  test("rename CAS: a manifest raced onto disk makes the slower writer lose") {
    val root = freshRoot()
    GraftTable.create(table3(Seq((1L, "a", 1.0))), root)
    // an external writer publishes v1 directly (the interleaving where
    // both writers pass the fast-fail check and race the rename)
    val log = new java.io.File(s"$root/_graft_log")
    val winner = new java.io.File(log, "v00000001.commit")
    val w = new java.io.PrintWriter(winner, "UTF-8")
    w.print("graft-commit-v1\nversion:1\nparent:0\nop:APPEND\n" +
      "schema:`k` BIGINT,`name` STRING,`bal` DOUBLE\n")
    w.close()
    val e = intercept[GraftTable.ConflictException] {
      GraftTable.append(table3(Seq((5L, "e", 5.0))), root,
        expectedVersion = 0L)
    }
    assert(e.actual == 1L)
    // the loser's staged data is an unreferenced orphan at most
    assert(GraftTable.readVersion(spark, root, 1L).count() == 0L)
  }

  test("empty version reads as an empty table with the manifest schema") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(table3(Seq((1L, "a", 1.0))), root)
    // delete-everything merge -> empty snapshot, schema preserved
    val wipe = Seq((1L, "a", 1.0, "D", 1L))
      .toDF("k", "name", "bal", "op", "seq")
    GraftTable.merge(root, wipe, "k", Seq("seq"), 0L)
    val v1 = GraftTable.read(spark, root)
    assert(v1.count() == 0L)
    assert(v1.columns.toSeq == Seq("k", "name", "bal"))
    // and a further append on top of the empty version works
    GraftTable.append(table3(Seq((7L, "g", 7.0))), root, 1L)
    assert(GraftTable.read(spark, root).count() == 1L)
  }

  test("appendBatchIdempotent: replays are no-ops, first writes create the table") {
    val root = freshRoot()
    // batch 0 creates the table
    assert(GraftTable.appendBatchIdempotent(
      table3(Seq((1L, "a", 1.0))), 0L, root))
    assert(GraftTable.appendBatchIdempotent(
      table3(Seq((2L, "b", 2.0))), 1L, root))
    assert(GraftTable.read(spark, root).count() == 2L)
    // exact replay of batch 1 (post-crash at-least-once delivery):
    // detected via the manifest batch id, no new version, no new rows
    assert(!GraftTable.appendBatchIdempotent(
      table3(Seq((2L, "b", 2.0))), 1L, root))
    assert(GraftTable.latestVersion(spark, root) == 1L)
    assert(GraftTable.read(spark, root).count() == 2L)
    assert(GraftTable.history(spark, root).map(_.batch) ==
      Seq(Some(0L), Some(1L)))
  }

  test("compact rewrites into fewer files with identical rows; old versions unaffected") {
    val root = freshRoot()
    GraftTable.create(table3(Seq((1L, "a", 1.0))), root)
    GraftTable.append(table3(Seq((2L, "b", 2.0))), root, 0L)
    GraftTable.append(table3(Seq((3L, "c", 3.0))), root, 1L)
    assert(GraftTable.history(spark, root).last.files.size >= 3)
    val v3 = GraftTable.compact(spark, root, expectedVersion = 2L)
    val c = GraftTable.history(spark, root).last
    assert(c.op == "COMPACT" && c.version == v3 && c.files.size == 1)
    assert(GraftTable.readVersion(spark, root, v3).orderBy("k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // the compacted files are new; v2 still reads its own
    assert(GraftTable.readVersion(spark, root, 2L).count() == 3L)
    // vacuum keeps everything: every data dir is referenced by SOME
    // manifest (v0-v2's by theirs, the compacted dir by v3's)
    assert(GraftTable.vacuum(spark, root).isEmpty)
  }

  test("schema evolution: add-column appends null-fill history; drops/retypes reject") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(table3(Seq((1L, "a", 1.0))), root)
    // a mismatched plain append fails loudly (typo protection)
    intercept[IllegalArgumentException] {
      GraftTable.append(Seq((2L, "b")).toDF("k", "name"), root, 0L)
    }
    // evolve: add a nullable column
    val wide = Seq((2L, "b", 2.0, "x")).toDF("k", "name", "bal", "tag")
    GraftTable.appendEvolve(wide, root, 0L)
    val latest = GraftTable.read(spark, root).orderBy("k")
    assert(latest.columns.toSeq == Seq("k", "name", "bal", "tag"))
    val rows = latest.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) null else r.getString(3)))
    assert(rows.toSeq == Seq((1L, null), (2L, "x")))
    // time travel: version 0 keeps its narrower schema
    assert(GraftTable.readVersion(spark, root, 0L).columns.toSeq ==
      Seq("k", "name", "bal"))
    // dropping or retyping columns rejects
    intercept[IllegalArgumentException] {
      GraftTable.appendEvolve(Seq((3L, "c")).toDF("k", "name"), root, 1L)
    }
    intercept[IllegalArgumentException] {
      GraftTable.appendEvolve(
        Seq((3L, "c", 3, "y")).toDF("k", "name", "bal", "tag"), root, 1L)
    }
    // a TYPED non-nullable added column must commit as NULLABLE:
    // historic files null-fill it, so publishing NOT NULL would hand
    // the optimizer a false IsNotNull it could prune on
    val typed = Seq((9L, "i", 9.0, "x", 7L))
      .toDF("k", "name", "bal", "tag", "score")
    assert(!typed.schema("score").nullable)
    GraftTable.appendEvolve(typed, root, 1L)
    val after = GraftTable.read(spark, root)
    assert(after.schema("score").nullable,
      "added column must be committed nullable")
    val nullScores = after.filter(col("score").isNull).count()
    assert(nullScores == 2L, s"historic rows must read NULL, got $nullScores non-null-filtered")
  }

  test("deleteWhere: atomic predicate delete, NULL predicate keeps the row") {
    import spark.implicits._
    val root = freshRoot()
    GraftTable.create(
      Seq((1L, Some(1.0)), (2L, None), (3L, Some(3.0)))
        .toDF("k", "bal"), root)
    // bal > 2.0 is NULL for row 2 -> kept (SQL DELETE semantics)
    val v1 = GraftTable.deleteWhere(spark, root, col("bal") > 2.0, 0L)
    assert(GraftTable.readVersion(spark, root, v1).orderBy("k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // time travel intact; history records the DELETE
    assert(GraftTable.readVersion(spark, root, 0L).count() == 3L)
    assert(GraftTable.history(spark, root).last.op == "DELETE")
  }

  test("pushdown survives the versioning layer: filter reaches the parquet scan") {
    val root = freshRoot()
    GraftTable.create(table3((1L to 100L).map(i => (i, s"n$i", i * 1.0))),
      root)
    val plan = GraftTable.read(spark, root)
      .filter(col("k") === 7L).select("k", "name")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(k), EqualTo(k,7)]"),
      s"filter not pushed to scan:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("bal"),
      s"column pruning lost:\n$plan")
  }
}
