package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Minimal transactional table format: a versioned commit log over
  * plain parquet — snapshot isolation, time-travel reads, ACID MERGE,
  * and optimistic concurrent-writer conflict detection (VERDICT r13
  * "what's missing" #2 / next-round #3). The design is the published
  * Delta Lake recipe (Armbrust et al., "Delta Lake: High-Performance
  * ACID Table Storage over Cloud Object Stores", VLDB 2020) reduced to
  * its core, built from scratch because the sandbox carries no
  * delta-spark / iceberg-runtime jars (the boundary documented at
  * [[Cdc]]'s scaladoc since round 13).
  *
  * Layout under a table root:
  * {{{
  *   _graft_log/v00000000.commit   one text manifest per version
  *   data/v00000001-<token>/part-*.parquet   staged-then-published data
  * }}}
  *
  * The commit protocol is write-data-then-publish-manifest:
  *   1. the writer stages parquet under a version+token directory no
  *      reader ever lists (readers resolve files ONLY through
  *      manifests, so a torn/abandoned stage is invisible — the q93
  *      marker discipline at table granularity);
  *   2. the manifest is written to a temp name and PUT-IF-ABSENT
  *      renamed to `v{N}.commit`. Hadoop's rename contract (HDFS and
  *      the local FS alike) fails when the destination exists, which
  *      makes the rename the atomic compare-and-swap Delta uses on
  *      HDFS: of two writers racing to version N, exactly one rename
  *      wins; the loser's data stays orphaned-and-invisible and it
  *      gets a [[GraftTable.ConflictException]] to retry against the
  *      new latest version.
  *
  * Scale shape: the log is O(versions) tiny text files handled on the
  * driver — data never moves through it. Reads resolve a manifest to a
  * file list and hand it to the ordinary parquet scan with an explicit
  * schema, so column pruning and predicate pushdown are untouched by
  * the versioning layer (PushedFilters reach the scan exactly as on a
  * bare directory). MERGE is [[Cdc.latestWinsMerge]]'s plan — partial-
  * agg winner collapse + one full-outer equi-join — plus one commit;
  * this minimal layer rewrites the full snapshot per MERGE where Delta
  * prunes to matched files, a documented simplification that changes
  * write amplification, never semantics. Time travel is an O(1)
  * manifest lookup.
  */
object GraftTable {

  /** One committed version: files are root-relative; `batch` carries
    * the streaming micro-batch id for commits published through
    * [[appendBatchIdempotent]] (the exactly-once replay check).
    */
  final case class Commit(version: Long, parent: Long, op: String,
      schemaDdl: String, files: Seq[String],
      batch: Option[Long] = None)

  /** Optimistic-concurrency failure: another writer published
    * `actual` while this writer expected to commit `expected + 1`.
    * Retry by re-reading the latest snapshot and re-deriving the
    * change against it.
    */
  final class ConflictException(val expected: Long, val actual: Long)
    extends RuntimeException(
      s"version ${expected + 1} already committed (latest is $actual); " +
        "re-read the latest snapshot and retry")

  private val LogDir = "_graft_log"

  /** Schema comparison key: names + types, nullability-normalized — a
    * NOT-NULL batch appended into a nullable table is safe (the
    * reverse too: the committed schema stays the table's), and typed
    * Dataset sources routinely produce non-nullable primitive fields
    * where a join output is nullable.
    */
  private def normalize(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map(f =>
        f.copy(dataType = normalize(f.dataType), nullable = true)))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = normalize(a.elementType), containsNull = true)
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(keyType = normalize(m.keyType),
        valueType = normalize(m.valueType), valueContainsNull = true)
    case other => other
  }

  private def schemaKey(s: StructType): String =
    normalize(s).asInstanceOf[StructType].toDDL

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestPath(root: String, v: Long): Path =
    new Path(f"$root/$LogDir/v$v%08d.commit")

  /** Latest committed version, -1 when the table does not exist. */
  def latestVersion(spark: SparkSession, root: String): Long = {
    val dir = new Path(s"$root/$LogDir")
    val f = fs(spark, root)
    if (!f.exists(dir)) return -1L
    f.listStatus(dir)
      .map(_.getPath.getName)
      .collect { case ManifestRe(v) => v.toLong }
      .foldLeft(-1L)(math.max)
  }

  private val ManifestRe = "v(\\d{8})\\.commit".r

  /** All commits, version-ascending. */
  def history(spark: SparkSession, root: String): Seq[Commit] = {
    val latest = latestVersion(spark, root)
    (0L to latest).map(v => readManifest(spark, root, v))
  }

  private def readManifest(spark: SparkSession, root: String,
      v: Long): Commit = {
    val p = manifestPath(root, v)
    val f = fs(spark, root)
    require(f.exists(p), s"version $v does not exist under $root")
    val in = f.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = text.split("\n").toSeq
    def field(k: String): String = lines
      .find(_.startsWith(s"$k:"))
      .map(_.drop(k.length + 1))
      .getOrElse(sys.error(s"manifest $p missing field $k"))
    Commit(
      version = field("version").toLong,
      parent = field("parent").toLong,
      op = field("op"),
      schemaDdl = field("schema"),
      files = lines.filter(_.startsWith("file:")).map(_.drop(5)),
      batch = lines.find(_.startsWith("batch:")).map(_.drop(6).toLong))
  }

  /** Stage `df` as parquet and atomically publish it as version
    * `expected + 1`. Returns the new version; throws
    * [[ConflictException]] when another writer got there first.
    */
  private def commitVersion(df: DataFrame, root: String, op: String,
      expected: Long, carryFiles: Seq[String],
      batch: Option[Long] = None,
      schemaDdl: Option[String] = None): Long = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    val next = expected + 1
    // cheap fast-fail before any data is written; the rename below is
    // the authoritative check
    val seen = latestVersion(spark, root)
    if (seen != expected) throw new ConflictException(expected, seen)

    val token = java.util.UUID.randomUUID.toString.take(8)
    val dataRel = f"data/v$next%08d-$token"
    df.write.parquet(s"$root/$dataRel")
    val parts = f.listStatus(new Path(s"$root/$dataRel"))
      .map(_.getPath.getName)
      .filter(_.startsWith("part-"))
      .sorted
      .map(n => s"$dataRel/$n")

    val manifest = new StringBuilder()
      .append("graft-commit-v1\n")
      .append(s"version:$next\n")
      .append(s"parent:$expected\n")
      .append(s"op:$op\n")
      .append(s"schema:${schemaDdl.getOrElse(df.schema.toDDL)}\n")
    batch.foreach(b => manifest.append(s"batch:$b\n"))
    (carryFiles ++ parts).foreach(p => manifest.append(s"file:$p\n"))

    val tmp = new Path(s"$root/$LogDir/.tmp-v$next-$token")
    f.mkdirs(new Path(s"$root/$LogDir"))
    val out = f.create(tmp, false)
    try out.write(manifest.toString.getBytes("UTF-8"))
    finally out.close()
    val dest = manifestPath(root, next)
    // put-if-absent CAS: Hadoop rename refuses an existing destination
    val won = !f.exists(dest) && f.rename(tmp, dest)
    if (!won) {
      f.delete(tmp, false)
      f.delete(new Path(s"$root/$dataRel"), true)
      throw new ConflictException(expected, latestVersion(spark, root))
    }
    next
  }

  /** Create the table as version 0 from `df`. The root must hold no
    * committed versions.
    */
  def create(df: DataFrame, root: String): Long = {
    val seen = latestVersion(df.sparkSession, root)
    require(seen == -1L, s"table already exists at $root (version $seen)")
    commitVersion(df, root, "CREATE", -1L, Nil)
  }

  /** Append `df`'s rows as a new version: the manifest carries the
    * parent's files plus the new ones — no data is rewritten. The
    * schema must match the table's exactly — a typo'd or re-typed
    * column must fail loudly here, not silently null-fill historic
    * rows at read time; deliberate column ADDITION goes through
    * [[appendEvolve]].
    */
  def append(df: DataFrame, root: String, expectedVersion: Long): Long = {
    val parent = readManifest(df.sparkSession, root, expectedVersion)
    require(schemaKey(df.schema) ==
      schemaKey(StructType.fromDDL(parent.schemaDdl)),
      s"schema mismatch: table has [${parent.schemaDdl}], append has " +
        s"[${df.schema.toDDL}] — use appendEvolve to add columns")
    commitVersion(df, root, "APPEND", expectedVersion, parent.files)
  }

  /** Schema-evolving append (ALTER TABLE ADD COLUMNS + APPEND in one
    * atomic commit): `df` must carry every existing column with its
    * exact type and may add new ones. The committed schema lists the
    * parent's columns first (in their original order) then the added
    * ones, and the new version's explicit-schema read null-fills the
    * added columns for every historic file — while time-travel reads
    * of earlier versions keep their own narrower schema, so evolution
    * never bleeds backwards. Dropping or re-typing a column is
    * rejected — those rewrite history and belong to a MERGE/rewrite,
    * not an append.
    */
  def appendEvolve(df: DataFrame, root: String,
      expectedVersion: Long): Long = {
    import org.apache.spark.sql.functions.col
    val parent = readManifest(df.sparkSession, root, expectedVersion)
    val p = StructType.fromDDL(parent.schemaDdl)
    p.fields.foreach { f =>
      val c = df.schema.find(_.name == f.name)
      require(c.isDefined, s"evolution cannot drop column ${f.name}")
      require(normalize(c.get.dataType) == normalize(f.dataType),
        s"evolution cannot retype ${f.name}: " +
          s"${f.dataType.sql} -> ${c.get.dataType.sql}")
    }
    val added = df.schema.filterNot(f => p.fieldNames.contains(f.name))
    val ordered = df.select(
      (p.fields.map(f => col(f.name)) ++ added.map(f => col(f.name))): _*)
    // the committed schema forces the ADDED columns nullable whatever
    // the batch declared: every historic file null-fills them at read
    // time, and a typed non-nullable source column (Dataset[Long])
    // must not publish a NOT NULL contract those files cannot honor —
    // the optimizer would be free to prune IsNotNull on a column that
    // IS null for most of the table
    val evolved = StructType(p.fields ++ added.map(_.copy(nullable = true)))
    commitVersion(ordered, root, "APPEND", expectedVersion, parent.files,
      schemaDdl = Some(evolved.toDDL))
  }

  /** Exactly-once streaming sink primitive: append a micro-batch as a
    * new version, recording `batchId` in the manifest so a Structured
    * Streaming replay of the same batch (at-least-once delivery after
    * a crash) detects the prior commit and becomes a no-op — the q93
    * `writeBatchIdempotent` discipline upgraded from marker files to
    * transactional versions, so a reader NEVER sees a torn batch and
    * concurrent table writers serialize through the same CAS. Creates
    * the table when the root is empty. Returns true when the batch was
    * committed, false when it had already landed.
    *
    * A [[ConflictException]] from another writer is retried after
    * re-checking the log (our batch may have been the winner), bounded
    * at 5 attempts.
    */
  def appendBatchIdempotent(df: DataFrame, batchId: Long,
      root: String): Boolean = {
    val spark = df.sparkSession
    var attempts = 0
    while (true) {
      val latest = latestVersion(spark, root)
      if (latest >= 0 &&
        history(spark, root).exists(_.batch.contains(batchId)))
        return false
      try {
        if (latest == -1L)
          commitVersion(df, root, "CREATE", -1L, Nil, Some(batchId))
        else {
          val parent = readManifest(spark, root, latest)
          require(schemaKey(df.schema) ==
            schemaKey(StructType.fromDDL(parent.schemaDdl)),
            s"schema mismatch: table has [${parent.schemaDdl}], batch " +
              s"$batchId has [${df.schema.toDDL}]")
          commitVersion(df, root, "APPEND", latest, parent.files,
            Some(batchId))
        }
        return true
      } catch {
        case e: ConflictException =>
          attempts += 1
          if (attempts >= 5) throw e
      }
    }
    false // unreachable
  }

  /** Small-file compaction (OPTIMIZE): rewrite the snapshot at
    * `expectedVersion` into `numFiles` files as a new COMPACT version —
    * same rows, fewer files, committed through the same CAS so readers
    * and concurrent writers are unaffected. Earlier versions keep
    * reading their own (untouched) files; [[vacuum]] never removes
    * them because their manifests still reference them.
    */
  def compact(spark: SparkSession, root: String, expectedVersion: Long,
      numFiles: Int = 1): Long = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    val snap = readVersion(spark, root, expectedVersion)
    commitVersion(snap.repartition(numFiles), root, "COMPACT",
      expectedVersion, Nil)
  }

  /** ACID MERGE: apply a changelog (op I/U/D, latest-wins by
    * `ordering`) to the snapshot at `expectedVersion` and commit the
    * result as one new version. The merge plan is
    * [[Cdc.latestWinsMerge]] verbatim; the commit is atomic, so a
    * reader sees the pre-merge or post-merge snapshot, never a torn
    * mixture, and a concurrent writer's commit surfaces as a
    * [[ConflictException]] instead of a lost update.
    */
  def merge(root: String, changes: DataFrame, key: String,
      ordering: Seq[String], expectedVersion: Long): Long = {
    val spark = changes.sparkSession
    val base = readVersion(spark, root, expectedVersion)
    val merged = Cdc.latestWinsMerge(base, changes, key, ordering)
    commitVersion(merged, root, "MERGE", expectedVersion, Nil)
  }

  /** ACID DELETE WHERE: commit a new version whose snapshot is the
    * `expectedVersion` snapshot minus the rows matching `condition` —
    * one atomic commit, so readers see pre- or post-delete, never a
    * partial removal. Like [[merge]], this minimal layer rewrites the
    * snapshot where Delta would prune to the files containing matches
    * — a write-amplification simplification, never a semantic one.
    * Null-safe: rows where the predicate is NULL are KEPT (SQL DELETE
    * semantics — only rows where the condition is TRUE go).
    */
  def deleteWhere(spark: SparkSession, root: String,
      condition: org.apache.spark.sql.Column,
      expectedVersion: Long): Long = {
    val snap = readVersion(spark, root, expectedVersion)
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    val kept = snap.filter(not(coalesce(condition, lit(false))))
    commitVersion(kept, root, "DELETE", expectedVersion, Nil)
  }

  /** Snapshot at `version` — the time-travel read. The scan carries
    * the manifest's schema explicitly, so an empty version reads as an
    * empty table of the right shape and later schema changes never
    * bleed backwards.
    */
  def readVersion(spark: SparkSession, root: String,
      version: Long): DataFrame = {
    val c = readManifest(spark, root, version)
    val schema = StructType.fromDDL(c.schemaDdl)
    if (c.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).parquet(c.files.map(p => s"$root/$p"): _*)
  }

  /** Latest snapshot. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val latest = latestVersion(spark, root)
    require(latest >= 0L, s"no committed versions under $root")
    readVersion(spark, root, latest)
  }

  /** Delete every data directory no manifest references (abandoned
    * stages from crashed or conflicted writers). Never touches
    * manifests or referenced data, so every committed version stays
    * readable. Returns the deleted directory names.
    */
  def vacuum(spark: SparkSession, root: String): Seq[String] = {
    val f = fs(spark, root)
    val dataDir = new Path(s"$root/data")
    if (!f.exists(dataDir)) return Nil
    val referenced = history(spark, root)
      .flatMap(_.files)
      .map(_.split("/")(1))
      .toSet
    val orphans = f.listStatus(dataDir)
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filterNot(referenced)
      .toSeq.sorted
    orphans.foreach(d => f.delete(new Path(dataDir, d), true))
    orphans
  }
}
