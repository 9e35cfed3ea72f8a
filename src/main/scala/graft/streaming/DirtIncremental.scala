package graft.streaming

import graft.pipeline.DirtPipeline
import graft.util.Checkpoints
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental MI/similarity maintenance — the step past
  * [[DirtStreaming.streamingTriples]]: instead of re-deriving MI from the
  * full triple state every trigger, each micro-batch folds its delta into
  * maintained snapshots and re-joins ONLY the touched (path, slot, word)
  * slice. The reference pipeline is monotone counts → re-derived
  * aggregates (`DirtDriver.java:694-700`), which is exactly the shape the
  * materialized-view merge (`Cdc.mergeAggDelta`) maintains.
  *
  * What is maintained incrementally (the shuffle-heavy part):
  *   - `triples`   (path, slot, word, cnt): union + partial-agg sum merge,
  *     cost |state| + |delta| per batch — integer sums, so merge order
  *     cannot drift from a from-scratch aggregation.
  *   - `swMargins` / `psMargins`: same merge on their keys.
  *   - `features`  (path, slot, word, cnt, ps_cnt, sw_cnt): the 3-way
  *     MI join, refreshed only where the batch touched it. A feature row
  *     is stale iff its own cnt changed, its (path, slot) margin changed,
  *     or its (slot, word) margin changed — all three key sets are
  *     delta-derived and batch-sized, so the refresh is two broadcast
  *     semi-joins + two broadcast anti-joins, never a full re-join.
  *
  * What is deliberately NOT maintained: the MI value itself. MI depends
  * on the GLOBAL N (`ln(cnt·N / (ps·sw))`), which moves every batch and
  * would invalidate every stored value. [[miFeatures]] instead applies
  * the log expression at read time over the maintained join — map-only,
  * no shuffle — using the IDENTICAL expression tree as the batch
  * `DirtPipeline.miFeatures`, so the view is bit-identical to a
  * from-scratch batch run after every batch (asserted exactly, not
  * within-epsilon, by `DirtIncrementalSpec`). Similarity then composes
  * the unchanged batch `DirtPipeline.similarity` over the view.
  *
  * Scale shape: per batch the merges shuffle |vocabulary| + |delta| rows
  * (never the corpus), the slice refresh touches only delta-keyed rows,
  * and every snapshot is localCheckpoint'ed with the previous
  * generation's blocks freed — state is bounded by vocabulary, lineage
  * by one batch.
  */
object DirtIncremental {

  /** Maintained snapshots. All DataFrames are localCheckpoint'ed
    * (materialized, lineage-free); `n` is the running global N.
    */
  final case class State(
      triples: DataFrame,
      swMargins: DataFrame,
      psMargins: DataFrame,
      features: DataFrame,
      n: Long,
      batches: Long) {

    /** Total state rows — the spec/bench bound: vocabulary-sized,
      * never corpus-sized.
      */
    def stateRows: Long = triples.count() + features.count()
  }

  def empty(spark: SparkSession): State = {
    import spark.implicits._
    val tr = Seq.empty[(String, String, String, Long)]
      .toDF("path", "slot", "word", "cnt")
    val sw = Seq.empty[(String, String, Long)].toDF("slot", "word", "sw_cnt")
    val ps = Seq.empty[(String, String, Long)].toDF("path", "slot", "ps_cnt")
    val ft = Seq.empty[(String, String, String, Long, Long, Long)]
      .toDF("path", "slot", "word", "cnt", "ps_cnt", "sw_cnt")
    State(tr, sw, ps, ft, 0L, 0L)
  }

  /** Monoid merge of a keyed count snapshot with a pre-aggregated delta
    * (the `Cdc.mergeAggDelta` shape): union + partial-agg sum. Long
    * arithmetic, so the merged value is exactly the from-scratch sum.
    */
  private def mergeCounts(snapshot: DataFrame, delta: DataFrame,
      keys: Seq[String], cntCol: String): DataFrame =
    snapshot.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(cntCol).cast("long").as(cntCol))

  /** Fold one micro-batch of corpus lines into the state. Returns the
    * new state; the previous state's checkpoint blocks are freed.
    */
  def applyBatch(state: State, lines: Dataset[String]): State = {
    val spark = lines.sparkSession

    val deltaTr = DirtPipeline.triples(
      DirtPipeline.extractInstances(DirtPipeline.parseCorpus(lines)))
      .localCheckpoint(true)
    val deltaN = deltaTr.agg(coalesce(sum("cnt"), lit(0L))).head().getLong(0)

    val triples2 = mergeCounts(state.triples, deltaTr,
      Seq("path", "slot", "word"), "cnt").localCheckpoint(true)
    val sw2 = mergeCounts(state.swMargins,
      deltaTr.groupBy("slot", "word").agg(sum("cnt").as("sw_cnt")),
      Seq("slot", "word"), "sw_cnt").localCheckpoint(true)
    val ps2 = mergeCounts(state.psMargins,
      deltaTr.groupBy("path", "slot").agg(sum("cnt").as("ps_cnt")),
      Seq("path", "slot"), "ps_cnt").localCheckpoint(true)

    // the three staleness key sets, all bounded by the batch vocabulary
    val touchedSw = deltaTr.select("slot", "word").distinct()
    val touchedPs = deltaTr.select("path", "slot").distinct()

    // refresh slice: state rows whose margin inputs moved. cnt-touched
    // rows are a subset of ps-touched rows (the delta triple's own
    // (path, slot) margin necessarily moved), so two key sets suffice.
    val staleKeys = triples2
      .join(broadcast(touchedSw), Seq("slot", "word"), "left_semi")
      .unionByName(
        triples2.join(broadcast(touchedPs), Seq("path", "slot"), "left_semi"))
      .distinct()
    val refreshed = staleKeys
      .join(sw2, Seq("slot", "word"), "inner")
      .join(ps2, Seq("path", "slot"), "inner")
      .select("path", "slot", "word", "cnt", "ps_cnt", "sw_cnt")
    val kept = state.features
      .join(broadcast(touchedSw), Seq("slot", "word"), "left_anti")
      .join(broadcast(touchedPs), Seq("path", "slot"), "left_anti")
    val features2 = kept.unionByName(refreshed).localCheckpoint(true)

    Seq(state.triples, state.swMargins, state.psMargins, state.features)
      .foreach(Checkpoints.free)
    Checkpoints.free(deltaTr)

    State(triples2, sw2, ps2, features2, state.n + deltaN,
      state.batches + 1)
  }

  /** The MI view over the maintained join — the same expression tree as
    * `DirtPipeline.miFeatures` (including the 0→1 N fallback,
    * `DirtDriver.java:1159`), applied map-only at read time, so the
    * result is bit-identical to a from-scratch batch run.
    */
  def miFeatures(state: State): DataFrame = {
    val n = if (state.n == 0L) 1L else state.n
    state.features
      .withColumn("mi",
        log(col("cnt").cast("double") * lit(n.toDouble) /
          (col("ps_cnt").cast("double") * col("sw_cnt").cast("double"))))
      .filter(col("cnt") > 0 && col("ps_cnt") * col("sw_cnt") > 0 &&
        col("mi") > 0.001)
      .select("path", "slot", "word", "mi")
  }

  /** Scored test pairs from the maintained state — batch
    * `DirtPipeline.similarity` composed over the incremental MI view.
    */
  def similarity(state: State, testSetLines: Seq[String]): DataFrame = {
    val spark = state.features.sparkSession
    import spark.implicits._
    val mi = miFeatures(state)
    DirtPipeline.similarity(mi, DirtPipeline.sumMi(mi),
      DirtPipeline.testPairs(testSetLines).toDF("p1", "p2"))
  }
}
