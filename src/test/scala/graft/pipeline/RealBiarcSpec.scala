package graft.pipeline

import graft.text.{BiarcParser, PathExtractor}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end DIRT quality on REAL-FORMAT Google-biarcs input
  * (VERDICT r12 #5): the committed corpus below uses the genuine corpus
  * line grammar — `head_word \t annotated_ngram \t total_count \t
  * counts_by_year` with `word/POS/dep/head` tokens — and realizes the
  * reference's published headline true-positive pair
  * `die from` ↔ `die of` (`analysis/AnalysisReport.md:55-61`) plus the
  * `lead to`/`result in` family, with tolerance probes (a malformed
  * token, an unparseable count, a short line) mixed in exactly as real
  * crawl shards have them.
  *
  * The assertions compare the DISTRIBUTED pipeline's scores against an
  * independent driver-side brute-force of the reference formula
  * (`DirtDriver.java:598-977`: mi = ln(cnt·N/(psCnt·swCnt)) kept when
  * > 0.001; Lin slot similarity = Σ_common(mi1+mi2)/(ΣsumMi1+ΣsumMi2);
  * score = geometric mean over X and Y) — plain Scala maps, no Spark —
  * so a join or aggregation bug in the pipeline cannot hide behind its
  * own arithmetic. Quality gates mirror the published behaviour: the
  * synonymous pair scores strictly positive and strictly above the
  * non-synonymous `die from`/`lead to` pair.
  */
class RealBiarcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("real-biarc-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Committed real-format corpus. Heads are 1-based over the KEPT
    * tokens (the reference parses tolerantly and skips malformed
    * tokens; the `zzz` line's heads are written against the surviving
    * positions, same as a real shard whose dropped token was trailing
    * annotation noise).
    */
  val corpus: Seq[String] = Seq(
    "die\tpatients/NNS/nsubj/2 die/VBP/ROOT/0 from/IN/prep/2 cancer/NN/pobj/3\t12\t1998,5 1999,7",
    "die\tmen/NNS/nsubj/2 die/VBP/ROOT/0 from/IN/prep/2 influenza/NN/pobj/3\t7\t2001,7",
    "die\tsoldiers/NNS/nsubj/2 die/VBP/ROOT/0 from/IN/prep/2 wounds/NNS/pobj/3\t4\t2002,4",
    "die\tpatients/NNS/nsubj/2 die/VBP/ROOT/0 of/IN/prep/2 cancer/NN/pobj/3\t9\t1997,9",
    "die\tmen/NNS/nsubj/2 die/VBP/ROOT/0 of/IN/prep/2 influenza/NN/pobj/3\t6\t2003,6",
    "die\tchildren/NNS/nsubj/2 die/VBP/ROOT/0 of/IN/prep/2 pneumonia/NN/pobj/3\t5\t2004,5",
    "lead\tsmoking/NN/nsubj/2 leads/VBZ/ROOT/0 to/IN/prep/2 cancer/NN/pobj/3\t8\t2000,8",
    "result\tsmoking/NN/nsubj/2 results/VBZ/ROOT/0 in/IN/prep/2 cancer/NN/pobj/3\t6\t2000,6",
    // protect against <-> protect from (published TP, AnalysisReport.md:57)
    "protect\tvaccines/NNS/nsubj/2 protect/VBP/ROOT/0 against/IN/prep/2 influenza/NN/pobj/3\t9\t2001,9",
    "protect\tmasks/NNS/nsubj/2 protect/VBP/ROOT/0 against/IN/prep/2 infection/NN/pobj/3\t5\t2020,5",
    "protect\tvaccines/NNS/nsubj/2 protect/VBP/ROOT/0 from/IN/prep/2 influenza/NN/pobj/3\t7\t2002,7",
    "protect\tmasks/NNS/nsubj/2 protect/VBP/ROOT/0 from/IN/prep/2 infection/NN/pobj/3\t4\t2021,4",
    // consist of <-> contain (published TP, AnalysisReport.md:58 — a
    // prep path paired with a plain dobj transitive)
    "consist\tbrain/NN/nsubj/2 consists/VBZ/ROOT/0 of/IN/prep/2 neurons/NNS/pobj/3\t8\t1999,8",
    "consist\tbody/NN/nsubj/2 consists/VBZ/ROOT/0 of/IN/prep/2 water/NN/pobj/3\t7\t1999,7",
    "contain\tbrain/NN/nsubj/2 contains/VBZ/ROOT/0 neurons/NNS/dobj/2\t6\t2000,6",
    "contain\tbody/NN/nsubj/2 contains/VBZ/ROOT/0 water/NN/dobj/2\t9\t2000,9",
    "contain\tmixture/NN/nsubj/2 contains/VBZ/ROOT/0 salt/NN/dobj/2\t3\t2000,3",
    // richer trees, the real-corpus shape: a det + dobj-prep chain (3
    // noun pairs; the risk-infection path has no verb and must drop)
    // and an aux-only copula (no valid path at all)
    "reduce\ttreatment/NN/nsubj/2 reduces/VBZ/ROOT/0 the/DT/det/4 risk/NN/dobj/2 of/IN/prep/4 infection/NN/pobj/5\t5\t2003,5",
    "be\tproblem/NN/nsubj/2 is/VBZ/ROOT/0 big/JJ/acomp/2\t9\t2000,9",
    // tolerance probes: malformed token (skipped), unparseable count
    // (falls back to 1), short line (dropped)
    "die\tzzz die/VBP/ROOT/0 from/IN/prep/1 heat/NN/pobj/2\t3\t2005,3",
    "die\tdogs/NNS/nsubj/2 die/VBP/ROOT/0 from/IN/prep/2 heatstroke/NN/pobj/3\tabc\t2005,1",
    "die\tonly_two_fields")

  val testSet: Seq[String] = Seq(
    "X die from Y\tX die of Y", // published TP (AnalysisReport.md:56)
    "X protect against Y\tX protect from Y", // published TP (:57)
    "X consist of Y\tX contain Y", // published TP (:58)
    "X die from Y\tX lead to Y") // non-synonymous control

  /** Independent brute-force of the reference formula over the same
    * parse kernels (the kernels themselves are golden-tested in
    * BiarcParserSpec/PathExtractorSpec; what this twin makes
    * independent is every JOIN and AGGREGATION between them and the
    * final score).
    */
  private def bruteForceScores: Map[(String, String), Double] = {
    val triples = scala.collection.mutable.Map
      .empty[(String, String, String), Long]
    corpus.flatMap(BiarcParser.parseLine).foreach { s =>
      PathExtractor.extract(s).foreach { pi =>
        triples((pi.path, "X", pi.x)) =
          triples.getOrElse((pi.path, "X", pi.x), 0L) + pi.cnt
        triples((pi.path, "Y", pi.y)) =
          triples.getOrElse((pi.path, "Y", pi.y), 0L) + pi.cnt
      }
    }
    val n = triples.values.sum.toDouble
    val sw = triples.groupBy { case ((_, s, w), _) => (s, w) }
      .map { case (k, m) => k -> m.values.sum }
    val ps = triples.groupBy { case ((p, s, _), _) => (p, s) }
      .map { case (k, m) => k -> m.values.sum }
    val mi = triples.flatMap { case ((p, s, w), c) =>
      val v = math.log(c * n / (ps((p, s)) * sw((s, w))).toDouble)
      if (v > 0.001) Some((p, s, w) -> v) else None
    }
    val sumMi = mi.groupBy { case ((p, s, _), _) => (p, s) }
      .map { case (k, m) => k -> m.values.sum }
    def slotSim(p1: String, p2: String, slot: String): Double = {
      val f1 = mi.collect { case ((`p1`, `slot`, w), v) => w -> v }.toMap
      val f2 = mi.collect { case ((`p2`, `slot`, w), v) => w -> v }.toMap
      val num = f1.keySet.intersect(f2.keySet).toSeq
        .map(w => f1(w) + f2(w)).sum
      val den = sumMi.getOrElse((p1, slot), 0.0) +
        sumMi.getOrElse((p2, slot), 0.0)
      if (den > 0.0) num / den else 0.0
    }
    DirtPipeline.testPairs(testSet).map { case (p1, p2) =>
      (p1, p2) -> math.sqrt(slotSim(p1, p2, "X") * slotSim(p1, p2, "Y"))
    }.toMap
  }

  test("tolerant parse: 21 sentences survive, probes behave as the reference") {
    val parsed = corpus.flatMap(BiarcParser.parseLine)
    assert(parsed.size == 21) // short line dropped
    assert(parsed(19).tokens.length == 3) // zzz token skipped
    assert(parsed(20).cnt == 1L) // 'abc' count falls back to 1
  }

  test("rich trees: multi-hop paths extract, verbless and aux-only paths drop") {
    val parsed = corpus.flatMap(BiarcParser.parseLine)
    // the reduce line: nouns (treatment, risk, infection) -> 3 pairs;
    // risk->of->infection carries no verb and must be dropped
    val reduceLine = parsed.find(_.tokens.exists(_.word == "reduces")).get
    val rich = PathExtractor.extract(reduceLine)
    assert(rich.map(_.path).sorted == Seq(
      "N:<nsubj:V:reduc:>dobj:N",
      "N:<nsubj:V:reduc:>dobj:W:risk:>prep:P:of:>pobj:N"))
    assert(rich.forall(_.cnt == 5L))
    // the copula line: the only verb on the path is auxiliary 'is'
    val isLine = parsed.find(_.tokens.exists(_.word == "big")).get
    assert(PathExtractor.extract(isLine).isEmpty)
  }

  test("pipeline scores on real-format biarcs match the brute-forced formula") {
    import spark.implicits._
    val expected = bruteForceScores
    val got = DirtPipeline
      .run(spark, corpus.toDS(), testSet)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(got.keySet == expected.keySet,
      s"pair sets differ: $got vs $expected")
    got.foreach { case (pair, s) =>
      assert(math.abs(s - expected(pair)) <= 1e-12 * math.max(1.0, s.abs),
        s"$pair: pipeline $s vs brute force ${expected(pair)}")
    }
  }

  test("published-quality shape: every published TP pair beats the control, all in (0,1]") {
    import spark.implicits._
    val got = DirtPipeline
      .run(spark, corpus.toDS(), testSet)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    def path(v: String, p: String) = s"N:<nsubj:V:$v:>prep:P:$p:>pobj:N"
    def canon(a: String, b: String) = if (a <= b) (a, b) else (b, a)
    val tps = Seq(
      "die from <-> die of" ->
        canon(path("die", "from"), path("die", "of")),
      "protect against <-> protect from" ->
        canon(path("protect", "against"), path("protect", "from")),
      "consist of <-> contain" ->
        canon(path("consist", "of"), "N:<nsubj:V:contain:>dobj:N"))
    val ctl = got(canon(path("die", "from"), path("lead", "to")))
    tps.foreach { case (label, pair) =>
      val s = got.getOrElse(pair,
        fail(s"published TP pair missing from output: $label ($pair)"))
      assert(s > 0.0 && s <= 1.0, s"$label score out of range: $s")
      assert(s > ctl,
        s"$label ($s) must outscore the non-synonymous control ($ctl)")
    }
  }
}
