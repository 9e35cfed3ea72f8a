package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet fixture tables (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] receives `(spark, sfDir)` and reads
  * tables through here so that filter/projection pushdown reaches the parquet
  * scan (one `spark.read.parquet` per table, no caching layer in between —
  * Catalyst prunes columns/row-groups per query).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** One `spark.read.parquet` per table, NO parallelism floor here.
    *
    * Each fixture table is a single small parquet file with one row
    * group, and one row group is one scan task — so a per-row-expensive
    * stage fed directly by a scan (codecs, tokenizers, signatures) runs
    * on ONE core of the whole cluster. The fix is
    * [[graft.util.Spread.cpuBound]] — but applied at the SPECIFIC
    * CPU-bound call sites (media generators, signature/verify maps,
    * deletion-variant fan-out), NOT blanket here: a measured full-bench
    * A/B showed the blanket floor costs every light query ~0.3–0.5 s
    * (round-robin's sort-before-repartition plus an extra AQE stage
    * barrier per read), which across 10–15-member composites outweighed
    * its wins, while the targeted sites keep the full benefit.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Alias of [[apply]] kept for consumers that must DOCUMENT their
    * dependence on the deterministic single-split scan order: q147's
    * DataSketches HLL estimate uses the HIP estimator (stream-order
    * dependent), and the frozen-quantizer provenance (FreezeCentroids,
    * drift gates) compares float reductions bit-exactly — both are only
    * stable because this read is one task at ANY core count.
    */
  def raw(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** `events.ts` has shipped in two fixture encodings across rounds:
    * NANOS-annotated int64 (which Spark 4 rejects by default — read as a
    * long via the legacy conf and integer-divided to microseconds; a
    * double roundtrip would lose precision on ~1.7e18 ns epoch values)
    * and plain `timestamp[us]` (inferred as TIMESTAMP_NTZ). Both
    * normalize to a session-TZ µs TIMESTAMP here — the session TZ is
    * pinned UTC everywhere, so the NTZ→TZ cast relabels the same wall
    * value — and every downstream query/oracle sees one schema
    * regardless of which fixture generation is on disk. Truncation
    * matches DuckDB's `CAST(ts AS TIMESTAMP)` ns→µs behavior used by
    * the oracle SQL.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // scoped set/restore: the conf is consumed at schema-inference time
    // (the read.parquet call below), so restoring it immediately after
    // keeps this read working without silently changing how any LATER
    // nanos-annotated parquet column is read in the same session
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    try {
      val df = apply(s, d, "events")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => // nanos-as-long fixture
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ => // timestamp[us] fixture (NTZ under the UTC session)
          df.withColumn("ts", col("ts").cast("timestamp"))
      }
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
