package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The prefix-filtered Jaccard join (AllPairs/PPJoin shape) must be
  * EXACT — identical output to the naive blocked all-pairs join — while
  * its candidate generation stays linear-ish on corpora where ubiquitous
  * words make the naive (block, word) self-join quadratic.
  */
class JaccardPrefixSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("jaccard-prefix-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** docs schema jaccardPairs expects: doc_id, text, lang, n_chars. */
  private def docsDF(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", 50L) } // one block
      .toDF("doc_id", "text", "lang", "n_chars")
  }

  /** Reference implementation: per-pair word-set Jaccard in plain Scala. */
  private def naivePairs(texts: Seq[String], t: Double): Set[(Long, Long, Double)] = {
    val sets = texts.map(_.trim.split("\\s+").toSet)
    (for {
      i <- sets.indices; j <- sets.indices if i < j
      inter = sets(i).intersect(sets(j)).size
      union = sets(i).size + sets(j).size - inter
      jac = BigDecimal(inter.toDouble / union)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jac >= t
    } yield (i.toLong, j.toLong, jac)).toSet
  }

  test("prefix-filtered output is exactly the naive all-pairs result") {
    import spark.implicits._
    // four near-dup families + shared stopwords + a lone outlier: pairs
    // above AND below threshold, ties in doc frequency, varied set sizes
    val texts = Seq(
      "the a quick brown fox jumps over lazy dog",
      "the a quick brown fox jumps over lazy cat",
      "the a quick brown fox leaps over lazy dog",
      "the a slow green turtle crawls under busy road",
      "the a slow green turtle crawls under busy street",
      "the a completely different document about spark engines",
      "unique singleton text sharing nothing with anything else")
    val got = Dedup.jaccardPairs(docsDF(texts), threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == naivePairs(texts, 0.5))
    assert(got.nonEmpty) // the family pairs must actually qualify
  }

  test("ubiquitous words never enter the candidate join (linear, not quadratic)") {
    // every doc shares 3 stopwords; the rest of each doc is unique.
    // Naive (block, word) join: 3 * n*(n-1)/2 rows. Prefix join: the
    // stopwords are every doc's HIGHEST-df words, so no doc's rarest-half
    // prefix contains them -> zero candidates.
    val n = 200
    val texts = (0 until n).map(i =>
      s"the of and u${i}a u${i}b u${i}c u${i}d u${i}e")
    val cands = Dedup.jaccardCandidates(docsDF(texts), threshold = 0.5)
    assert(cands.count() == 0L,
      s"expected 0 prefix candidates, naive would emit ${3L * n * (n - 1) / 2} join rows")
    assert(Dedup.jaccardPairs(docsDF(texts), threshold = 0.5).count() == 0L)
  }

  test("trigram tokens: exact vs naive, short docs collapse to one token") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat",   // shares 6 of 7 grams
      "dog lazy the over jumps fox brown quick the",   // same words, reversed
      "tiny doc",                                      // < 3 words
      "tiny doc")                                      // exact dup of short doc
    def grams(t: String): Set[String] = {
      val w = t.trim.split("\\s+").toSeq
      if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSet
      else Set(w.mkString(" "))
    }
    val expected = (for {
      i <- texts.indices; j <- texts.indices if i < j
      a = grams(texts(i)); b = grams(texts(j))
      inter = a.intersect(b).size
      jac = BigDecimal(inter.toDouble / (a.size + b.size - inter))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jac >= 0.5
    } yield (i.toLong, j.toLong, jac)).toSet
    val got = Dedup.jaccardPairs(docsDF(texts), threshold = 0.5, ngram = 3)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected)
    assert(got.contains((3L, 4L, 1.0))) // short-doc whole-text token
    assert(!got.exists(p => p._1 == 0L && p._2 == 2L)) // reversed != near-dup
  }

  test("randomized exactness across corpora and thresholds") {
    import spark.implicits._
    // seeded random corpora over a tiny vocabulary (maximal overlap
    // stress) swept over thresholds including awkward rationals like
    // 0.43, where a ceil'd float overlap bound once over-pruned a
    // boundary-exact true pair
    val rnd = new scala.util.Random(42)
    val vocab = ('a' to 'l').map(_.toString)
    val thresholds = Seq(0.3, 0.43, 0.5, 0.57, 0.66, 0.75)
    for (trial <- 1 to 8) {
      val n = 6 + rnd.nextInt(10)
      val texts = Seq.fill(n) {
        val k = 3 + rnd.nextInt(8)
        Seq.fill(k)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val t = thresholds(rnd.nextInt(thresholds.size))
      val got = Dedup.jaccardPairs(docsDF(texts), threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == naivePairs(texts, t),
        s"trial $trial t=$t diff=${got.diff(naivePairs(texts, t))} " +
          s"missing=${naivePairs(texts, t).diff(got)} texts=$texts")
    }
  }

  test("candidates superset the qualifying pairs (no lost true pair)") {
    import spark.implicits._
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta",
      "alpha beta gamma delta epsilon eta",
      "alpha beta gamma delta theta iota",
      "kappa lambda mu nu xi omicron")
    val truth = naivePairs(texts, 0.5).map { case (a, b, _) => (a, b) }
    val cands = Dedup.jaccardCandidates(docsDF(texts), threshold = 0.5)
      .as[(Long, Long)].collect().toSet
    assert(truth.subsetOf(cands), s"lost true pairs: ${truth.diff(cands)}")
  }
}
