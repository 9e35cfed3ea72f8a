package graft

import graft.queries.{PipelineQueries, Q, RelationalQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — one entry per implemented operator from SURVEY.md §2,
  * each with a DuckDB-equivalent oracle SQL where the semantics are
  * SQL-expressible (column names aligned; doubles rounded on both sides so
  * engine-order float summation can't flip the hash compare; every query
  * deterministically ordered). Hash-seeded operators (MinHash, SimHash,
  * SRP-LSH, the winnowing fingerprint) and the DIRT pipeline (biarc-corpus
  * input) carry no oracle and get the driver's rows-only check; their
  * semantics are golden-tested in `sbt test` instead.
  */
object SparkEntry {

  /** All driver-checkable queries, in declared order. */
  val all: Seq[Q] = Seq(
    // A1/A2/A10/P15/O1: TPC-H Q1-shaped aggregation (the round-1 flagship).
    Q.checked(
      "q01_agg_sum_groupby",
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         count(*) AS count_order
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""") { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    RelationalQueries.q02, RelationalQueries.q03, RelationalQueries.q04,
    RelationalQueries.q05, RelationalQueries.q06, RelationalQueries.q07,
    RelationalQueries.q08, RelationalQueries.q09, RelationalQueries.q10,
    RelationalQueries.q11, RelationalQueries.q12, RelationalQueries.q13,
    RelationalQueries.q14, RelationalQueries.q15, RelationalQueries.q16,
    RelationalQueries.q17, RelationalQueries.q18, RelationalQueries.q19,
    RelationalQueries.q20, RelationalQueries.q21, RelationalQueries.q22,
    RelationalQueries.q23, RelationalQueries.q24, RelationalQueries.q25,
    RelationalQueries.q26, RelationalQueries.q27, RelationalQueries.q28,
    RelationalQueries.q29, RelationalQueries.q47, RelationalQueries.q48,
    RelationalQueries.q49, RelationalQueries.q51,
    RelationalQueries.q57, RelationalQueries.q58,
    RelationalQueries.q72, RelationalQueries.q73, RelationalQueries.q87,
    RelationalQueries.q96, RelationalQueries.q97,
    RelationalQueries.q102, RelationalQueries.q103,
    RelationalQueries.q115,
    PipelineQueries.q30, PipelineQueries.q31, PipelineQueries.q32,
    PipelineQueries.q33, PipelineQueries.q34, PipelineQueries.q35,
    PipelineQueries.q36, PipelineQueries.q37, PipelineQueries.q38,
    PipelineQueries.q39, PipelineQueries.q40,
    PipelineQueries.q41, PipelineQueries.q42, PipelineQueries.q43,
    PipelineQueries.q44, PipelineQueries.q45, PipelineQueries.q46,
    PipelineQueries.q50, PipelineQueries.q52, PipelineQueries.q53,
    PipelineQueries.q54, PipelineQueries.q55, PipelineQueries.q56,
    PipelineQueries.q59, PipelineQueries.q60, PipelineQueries.q61,
    PipelineQueries.q62, PipelineQueries.q63, PipelineQueries.q64,
    PipelineQueries.q65, PipelineQueries.q66, PipelineQueries.q67,
    PipelineQueries.q68, PipelineQueries.q69,
    PipelineQueries.q70, PipelineQueries.q71,
    PipelineQueries.q74, PipelineQueries.q75, PipelineQueries.q76,
    PipelineQueries.q77, PipelineQueries.q78, PipelineQueries.q79,
    PipelineQueries.q80, PipelineQueries.q81, PipelineQueries.q82,
    PipelineQueries.q83, PipelineQueries.q84, PipelineQueries.q85,
    PipelineQueries.q86, PipelineQueries.q88, PipelineQueries.q89,
    PipelineQueries.q90, PipelineQueries.q91, PipelineQueries.q92,
    PipelineQueries.q93, PipelineQueries.q94, PipelineQueries.q95,
    PipelineQueries.q98, PipelineQueries.q99, PipelineQueries.q100,
    PipelineQueries.q101, PipelineQueries.q104, PipelineQueries.q105,
    PipelineQueries.q106, PipelineQueries.q107, PipelineQueries.q108,
    PipelineQueries.q109, PipelineQueries.q110, PipelineQueries.q111,
    PipelineQueries.q112, PipelineQueries.q113, PipelineQueries.q114,
    PipelineQueries.q116, PipelineQueries.q117, PipelineQueries.q118,
    PipelineQueries.q119, PipelineQueries.q120, PipelineQueries.q121,
    PipelineQueries.q122, PipelineQueries.q123, RelationalQueries.q124,
    PipelineQueries.q125, PipelineQueries.q126, RelationalQueries.q127,
    PipelineQueries.q128, PipelineQueries.q129, PipelineQueries.q130,
    RelationalQueries.q131, PipelineQueries.q132, PipelineQueries.q133,
    RelationalQueries.q134, PipelineQueries.q135, PipelineQueries.q136,
    PipelineQueries.q137, PipelineQueries.q138, PipelineQueries.q139,
    PipelineQueries.q140, PipelineQueries.q141, PipelineQueries.q142,
    PipelineQueries.q143, PipelineQueries.q144, PipelineQueries.q145,
    PipelineQueries.q146, PipelineQueries.q147, PipelineQueries.q148,
    PipelineQueries.q149, PipelineQueries.q150, PipelineQueries.q151,
    PipelineQueries.q152, PipelineQueries.q153,
    PipelineQueries.q154, PipelineQueries.q155,
    PipelineQueries.q156, PipelineQueries.q157, PipelineQueries.q158,
    PipelineQueries.q159, PipelineQueries.q160, PipelineQueries.q161,
    PipelineQueries.q162, PipelineQueries.q163, PipelineQueries.q164,
    PipelineQueries.q165, PipelineQueries.q166, PipelineQueries.q167,
    PipelineQueries.q168, PipelineQueries.q169, PipelineQueries.q170,
    PipelineQueries.q171, PipelineQueries.q172, PipelineQueries.q173,
    PipelineQueries.q174, PipelineQueries.q175, PipelineQueries.q176,
    PipelineQueries.q177, PipelineQueries.q178, PipelineQueries.q179)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg_sum_groupby")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
