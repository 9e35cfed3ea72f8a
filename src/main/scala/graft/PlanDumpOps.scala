package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Dump `.explain("formatted")` for OPERATOR-INTERNAL stages that no
  * declared query's top-level plan shows (iteration bodies that run
  * behind localCheckpoint boundaries, verify stages inside typed maps) —
  * the round-19 plan evidence for `plans/r19/`.
  *
  * Usage: `runMain graft.PlanDumpOps <sfDir> <outDir> <suffix> <name>...`
  * with names from the `dumps` map below. Same session shape as Bench.
  */
object PlanDumpOps {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names @ _*) = args.toSeq.toArray
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    new java.io.File(outDir).mkdirs()

    // bench-scale corpus by default so static size estimates produce
    // the same join strategies the timed entries plan (a tiny corpus
    // broadcasts the margin tables and hides the real exchanges)
    val groups = sys.env.getOrElse("SPARK_GRAFT_PLANTED_GROUPS", "41667").toInt

    def edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 5L)).toDS()

    val dumps: Map[String, () => org.apache.spark.sql.Dataset[_]] = Map(
      // one composed star round — the per-iteration body of
      // DupGraph.components (q68/q69/q83/q130, cx_dedup_graph,
      // dedup_components_adversarial, q78's closure stage)
      "star_round" -> (() =>
        graft.operators.DupGraph.smallStar(
          graft.operators.DupGraph.largeStar(edges))),
      // the minhash candidate-verify stage (q33/q136/cx_dedup_micro)
      "minhash_pairs" -> (() =>
        graft.operators.Dedup.minhashPairs(
          Tables.documents(spark, sfDir), threshold = 0.7)),
      // DIRT triples + margins + MI over the planted corpus — the
      // aggregation phase of dirt_planted/q40
      "dirt_mi" -> (() => {
        val tr = graft.pipeline.DirtPipeline.triples(
          graft.pipeline.DirtPipeline.extractInstances(
            graft.pipeline.DirtPipeline.parseCorpus(
              graft.queries.PlantedBiarc.scaledLines(spark, groups))))
        graft.pipeline.DirtPipeline.miFeatures(tr,
          graft.pipeline.DirtPipeline.swMargins(tr),
          graft.pipeline.DirtPipeline.psMargins(tr), 1000L)
      }),
      // full DIRT similarity lineage without the persist boundaries —
      // the complete exchange census of the pipeline
      "dirt_similarity_unpersisted" -> (() => {
        val pb = graft.queries.PlantedBiarc
        val tr = graft.pipeline.DirtPipeline.triples(
          graft.pipeline.DirtPipeline.extractInstances(
            graft.pipeline.DirtPipeline.parseCorpus(
              pb.scaledLines(spark, groups))))
        val mi = graft.pipeline.DirtPipeline.miFeatures(tr,
          graft.pipeline.DirtPipeline.swMargins(tr),
          graft.pipeline.DirtPipeline.psMargins(tr), 1000L)
        val pairs = graft.pipeline.DirtPipeline
          .testPairs(pb.scaledTestSet(groups)).toDF("p1", "p2")
        graft.pipeline.DirtPipeline.similarity(mi,
          graft.pipeline.DirtPipeline.sumMi(mi), pairs)
      }))

    names.foreach { n =>
      val plan = dumps(n)().queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
      spark.catalog.clearCache()
      println(s"dumped $n")
    }
    spark.stop()
  }
}
