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
  def applyBatch(state: State, lines: Dataset[String]): State =
    foldBatch(state, lines, None)._1

  /** The shared batch fold. When `member` is given — the maintained
    * member-path feature slice plus the (tiny, broadcastable) member
    * path list — the same delta that refreshes the global feature
    * snapshot also refreshes the member slice, so the scored-pair view
    * never re-scans the global state: the slice update is
    * `kept-members ∪ (refreshed ⋉ members)`, both sides delta-keyed.
    * The member maintenance MUST happen inside the fold: the staleness
    * key sets hang off `deltaTr`, whose checkpoint blocks are freed
    * before returning.
    */
  private def foldBatch(state: State, lines: Dataset[String],
      member: Option[(DataFrame, DataFrame)]): (State, Option[DataFrame]) = {
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

    // member slice: the same anti/semi discipline restricted to the
    // member path list. Anti-by-touched-keys and semi-by-path filter on
    // disjoint key sets, so they commute — the invariant
    // `memberFeatures == features ⋉ memberPaths` holds by induction.
    val member2 = member.map { case (memberFeatures, memberPaths) =>
      memberFeatures
        .join(broadcast(touchedSw), Seq("slot", "word"), "left_anti")
        .join(broadcast(touchedPs), Seq("path", "slot"), "left_anti")
        .unionByName(
          refreshed.join(broadcast(memberPaths), Seq("path"), "left_semi"))
        .localCheckpoint(true)
    }

    Seq(state.triples, state.swMargins, state.psMargins, state.features)
      .foreach(Checkpoints.free)
    member.foreach { case (mf, _) => Checkpoints.free(mf) }
    Checkpoints.free(deltaTr)

    (State(triples2, sw2, ps2, features2, state.n + deltaN,
      state.batches + 1), member2)
  }

  /** The MI view over the maintained join — the same expression tree as
    * `DirtPipeline.miFeatures` (including the 0→1 N fallback,
    * `DirtDriver.java:1159`), applied map-only at read time, so the
    * result is bit-identical to a from-scratch batch run.
    */
  def miFeatures(state: State): DataFrame =
    miView(state.features, state.n)

  /** The shared N-dependent read-time map — ONE definition, so the
    * full-snapshot view ([[miFeatures]]) and the member-slice view
    * ([[scoredPairs]]) can never drift expression-wise.
    */
  private def miView(features: DataFrame, n0: Long): DataFrame = {
    val n = if (n0 == 0L) 1L else n0
    features
      .withColumn("mi",
        log(col("cnt").cast("double") * lit(n.toDouble) /
          (col("ps_cnt").cast("double") * col("sw_cnt").cast("double"))))
      .filter(col("cnt") > 0 && col("ps_cnt") * col("sw_cnt") > 0 &&
        col("mi") > 0.001)
      .select("path", "slot", "word", "mi")
  }

  /** Scored test pairs from the maintained state — batch
    * `DirtPipeline.similarity` composed over the incremental MI view.
    * One-shot read: re-derives MI and SumMI from the FULL maintained
    * feature snapshot. For a standing test set that must be rescored
    * after every batch, use [[SimState]] instead — it maintains the
    * member-path feature slice so each rescore touches slice-sized
    * data, never the corpus vocabulary.
    */
  def similarity(state: State, testSetLines: Seq[String]): DataFrame = {
    val spark = state.features.sparkSession
    import spark.implicits._
    val mi = miFeatures(state)
    DirtPipeline.similarity(mi, DirtPipeline.sumMi(mi),
      DirtPipeline.testPairs(testSetLines).toDF("p1", "p2"))
  }

  /** Incrementally-maintained scored-pair view (round 11): the counts
    * state plus the feature slice of the test set's MEMBER PATHS, kept
    * in lockstep by [[applySimBatch]]. Why this is the right unit of
    * maintenance rather than the scores themselves: every MI value — and
    * therefore every score — depends on the global N, which moves with
    * EVERY batch, so stored score values would be invalidated wholesale
    * each trigger. The expensive inputs, by contrast, are N-free exact
    * longs: the (cnt, ps_cnt, sw_cnt) feature rows of the member paths.
    * [[scoredPairs]] applies the N-dependent math read-time over the
    * slice — the batch `DirtPipeline.similarity` composed over a
    * member-restricted MI view, which is exactly equal to the full-view
    * result because `similarity` only ever reads member-path rows
    * (its first act is a broadcast semi-join to the pair member list;
    * reference semantics `DirtDriver.java:972-975`).
    *
    * Per-batch cost: the shared [[foldBatch]] delta work plus a
    * slice-sized anti/semi refresh; per-rescore cost: slice-sized MI +
    * SumMI + the pair self-join — nothing scans the corpus-vocabulary
    * feature snapshot.
    */
  final case class SimState(
      inner: State,
      pairs: DataFrame,
      memberPaths: DataFrame,
      memberFeatures: DataFrame) {
    def batches: Long = inner.batches
    def stateRows: Long = inner.stateRows
  }

  def emptySim(spark: SparkSession, testSetLines: Seq[String]): SimState = {
    import spark.implicits._
    val pairs = DirtPipeline.testPairs(testSetLines).toDF("p1", "p2")
      .localCheckpoint(true)
    val memberPaths = pairs
      .select(explode(array(col("p1"), col("p2"))).as("path"))
      .distinct()
      .localCheckpoint(true)
    val mf = Seq.empty[(String, String, String, Long, Long, Long)]
      .toDF("path", "slot", "word", "cnt", "ps_cnt", "sw_cnt")
    SimState(empty(spark), pairs, memberPaths, mf)
  }

  /** Fold one micro-batch into both the counts state and the member
    * feature slice. Previous-generation checkpoint blocks are freed.
    */
  def applySimBatch(sim: SimState, lines: Dataset[String]): SimState = {
    val (inner2, member2) = foldBatch(sim.inner, lines,
      Some((sim.memberFeatures, sim.memberPaths)))
    SimState(inner2, sim.pairs, sim.memberPaths, member2.get)
  }

  /** The maintained scored-pair view: MI over the member slice with the
    * CURRENT global N, then the unchanged batch similarity — bit-range
    * identical to `DirtPipeline.run` over the accumulated corpus (the
    * member-restricted MI view changes no row `similarity` reads; float
    * sums are gated by `DirtIncrementalSpec` / the bench probe).
    */
  def scoredPairs(sim: SimState): DataFrame = {
    val mi = miView(sim.memberFeatures, sim.inner.n)
    DirtPipeline.similarity(mi, DirtPipeline.sumMi(mi), sim.pairs)
  }

  /** Free every checkpoint a [[SimState]] holds. */
  def release(sim: SimState): Unit = {
    Seq(sim.inner.triples, sim.inner.swMargins, sim.inner.psMargins,
      sim.inner.features, sim.pairs, sim.memberPaths, sim.memberFeatures)
      .foreach(Checkpoints.free)
  }
}
