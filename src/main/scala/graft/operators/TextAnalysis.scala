package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over a document
  * corpus: token counting, quality scoring, language identification and
  * document fingerprinting.
  *
  * All scoring/ID functions are pure `Column` expressions (whole-stage
  * codegen, no UDFs) so they stay inside WSCG at 100 TB and are portable
  * to the DuckDB oracle; only the rolling-hash fingerprint is a UDF
  * (deterministic, per-row, no state).
  */
object TextAnalysis {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alpha runs, digit runs, single punctuation —
    * the classic pre-tokenizer shape. The negated class spells out
    * `\x0B` because Java's `\s` contains it and RE2's does not — a
    * no-op under Java, and exactly what makes the ONE shared pattern
    * string behave identically in the DuckDB oracle (the round-13 fuzz
    * caught the divergence on vertical-tab input).
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s\\x0B]"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  /** Count non-overlapping occurrences of literal `marker` — portable
    * replace-based counting (no regex), identical in any engine.
    */
  def occurrences(text: Column, marker: String): Column =
    ((length(text) - length(replace(text, lit(marker)))) / marker.length)
      .cast("long")

  /** Stopword hit ratio over whitespace tokens. */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val stops = array(EnStopwords.map(lit): _*)
    size(filter(toks, t => array_contains(stops, t))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Mean token length (chars excluding whitespace / token count). */
  def avgTokenLen(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(size(tokens(text)), lit(1)).cast("double")

  /** Heuristic quality score, integer-valued in [0, 1000]: rewards
    * moderate length (up to 500), a plausible stopword ratio (up to 300)
    * and low punctuation (down to -200, rebased +200) — the standard
    * cheap pre-filter shape for LLM corpus cleaning. Deliberately pure
    * small-integer arithmetic (exact in IEEE doubles, floor-quantized),
    * so ANY engine recomputes it bit-identically — a fractional formula
    * rounded to 6dp can land on .5 decimal boundaries where BigDecimal
    * half-up (Spark) and float-multiply rounding (DuckDB) disagree.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = greatest(size(toks), lit(1))
    val stops = array(EnStopwords.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stops, t)))
    val nChars = greatest(length(text), lit(1))
    val nPunct = length(regexp_replace(text, "[^\\p{Punct}]", ""))
    val lenK = least(length(text), lit(500))
    val stopK = floor(lit(300) * least(nStop * 5, nTok) / nTok)
    val punctK = floor(lit(200) * least(nPunct * 4, nChars) / nChars)
    greatest(lit(0), lenK + stopK - punctK + lit(200)).cast("long")
  }

  // Round 13: the function-word-marker language-ID heuristic
  // (LangMarkers/langScore/langId) was REMOVED — the trained NB model
  // ([[LangId]] / the lang_id_model expression) is the engine's lang-ID
  // path, analyze() and the q37 oracle both migrated, and nothing
  // called the markers anymore. Recoverable from git history.

  /** 64-bit polynomial rolling-hash fingerprint: minimum of all k-gram
    * (k=8) CODE-POINT window hashes — a winnowing-style content
    * signature stable under document reordering of unrelated parts.
    * Code points, not UTF-16 units: the q38 oracle (`FingerprintSql`)
    * replays windows via `ord(substr(...))`/`length()`, which index
    * code points, so astral text must hash identically here (VERDICT
    * r14 #5 — for BMP text the two units coincide, keeping every pin).
    */
  val FingerprintK = 8
  val FingerprintB = 1000003L
  def fingerprintOf(s: String): Long = {
    val cps = graft.text.SqlText.codePoints(s)
    if (cps.length < FingerprintK) return 0L
    val B = FingerprintB
    var pow = 1L
    var i = 0
    while (i < FingerprintK - 1) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < FingerprintK) { h = h * B + cps(i); i += 1 }
    var min = h
    i = FingerprintK
    while (i < cps.length) {
      h = (h - cps(i - FingerprintK) * pow) * B + cps(i)
      if (h < min) min = h
      i += 1
    }
    min
  }
  val fingerprintUdf = udf(fingerprintOf _)

  /** Per-document repetition metrics (the Gopher-style repetition
    * quality filters, Rae et al. 2021 §A1.1): how much of the doc is the
    * same bigram repeated, and how many tokens are duplicates. All
    * metrics are INTEGERS (counts and floor-permilles via integer
    * division) so cross-engine rounding cannot flip an oracle compare;
    * filtering is a caller-side threshold on the permilles.
    */
  def repetitionStats(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("id"), col(textCol))
      .as[(Long, String)]
      .map { case (id, t) =>
        // non-empty-token semantics (round-13 fuzz): Java .trim strips
        // ALL chars <= 0x20 where SQL trim strips spaces only, so edge
        // newlines made the engines count empty tokens differently —
        // dropping empties entirely is the convention both mirror
        val w = (if (t == null) "" else t).split("\\s+").filter(_.nonEmpty)
        val n = w.length.toLong
        val topBigram =
          if (n < 2) 0L
          else w.sliding(2).map(p => p(0) + " " + p(1)).toSeq
            .groupBy(identity).valuesIterator.map(_.size).max.toLong
        val nDistinct = w.distinct.length.toLong
        (id, n, topBigram,
          if (n > 0) 2000L * topBigram / n else 0L,
          if (n > 0) 1000L * (n - nDistinct) / n else 0L)
      }
      .toDF(idCol, "n_tokens", "top_bigram_n",
        "bigram_permille", "dup_token_permille")
  }

  /** Gopher-style composite quality filter (Rae et al. 2021, Appendix A
    * document-filtering rules), restricted to the rules that are exact
    * integers cross-engine: token-count range, mean word length range
    * (in deci-chars via integer division), top-bigram coverage cap and
    * duplicate-token cap (both permille, the q64 metrics). One typed
    * map over (id, text) — map-only, no shuffle; every metric and the
    * pass verdict are integers/booleans, so the whole row is
    * hash-exact against any SQL twin. Callers keep `pass` docs;
    * emitting the per-doc metrics (not just the survivors) is what
    * makes threshold sweeps cheap — filter downstream, measure once.
    */
  def gopherFilter(docs: DataFrame,
      minTokens: Long = 20, maxTokens: Long = 80,
      minWordLenDeci: Long = 30, maxWordLenDeci: Long = 60,
      maxBigramPermille: Long = 250, maxDupPermille: Long = 400,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("id"), col(textCol))
      .as[(Long, String)]
      .map { case (id, t) =>
        // non-empty-token semantics — see [[repetitionStats]]
        val w = (if (t == null) "" else t).split("\\s+").filter(_.nonEmpty)
        val n = w.length.toLong
        // word length in CODE POINTS — the oracle's length(w); an emoji
        // is one char, not a surrogate pair (VERDICT r14 #5)
        val chars = w.map(x => graft.text.SqlText.cpLength(x).toLong).sum
        val wordLenDeci = if (n > 0) 10L * chars / n else 0L
        val topBigram =
          if (n < 2) 0L
          else w.sliding(2).map(p => p(0) + " " + p(1)).toSeq
            .groupBy(identity).valuesIterator.map(_.size).max.toLong
        val bigramPm = if (n > 0) 2000L * topBigram / n else 0L
        val dupPm =
          if (n > 0) 1000L * (n - w.distinct.length.toLong) / n else 0L
        val pass = n >= minTokens && n <= maxTokens &&
          wordLenDeci >= minWordLenDeci && wordLenDeci <= maxWordLenDeci &&
          bigramPm <= maxBigramPermille && dupPm <= maxDupPermille
        (id, n, wordLenDeci, bigramPm, dupPm, pass)
      }
      .toDF(idCol, "n_tokens", "word_len_deci", "bigram_permille",
        "dup_token_permille", "pass")
  }

  /** Guaranteed heavy hitters over the corpus token stream via a
    * Misra–Gries sketch ([[graft.functions.MisraGriesAggregator]]):
    * every token with true frequency > n/k, with its EXACT count.
    *
    * The sketch is the scale mechanism, not the answer: its summary
    * content is merge-order-dependent, but its guarantee — all >n/k
    * items present, counters low by ≤ n/k — is not. So the operator
    * computes the sketch (map-side partials shuffle ≤ k-1 counters per
    * partition), verifies both guarantees in-query against the exact
    * counts of the ≤ k-1 candidates (`require` — a violated bound
    * fails loudly rather than returning silently wrong results), and
    * emits the exact-counted survivors. Output is therefore
    * deterministic and SQL-oracle-able even though the sketch isn't.
    *
    * EAGER by design: the verification collects are the operator's
    * contract and are bounded by k (≤ k-1 candidate rows + one scalar),
    * never by the corpus. At most k-1 tokens can exceed n/k, so the
    * result set itself is bounded too.
    */
  def heavyHitters(docs: DataFrame, k: Int = 20,
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
    val sketch: Map[String, Long] = toks.as[String]
      .select(graft.functions.MisraGriesAggregator(k).toColumn).head()
    val n = toks.count()
    val exact = toks.groupBy("word").agg(count(lit(1)).as("cnt"))
    val candExact: Map[String, Long] =
      if (sketch.isEmpty) Map.empty
      else exact.filter(col("word").isin(sketch.keys.toSeq: _*))
        .as[(String, Long)].collect().toMap
    sketch.foreach { case (w, est) =>
      val ex = candExact(w)
      require(est <= ex && ex - est <= n / k,
        s"Misra-Gries bound violated for '$w': est=$est exact=$ex n/k=${n / k}")
    }
    val hitters = exact.filter(col("cnt") > n / k)
      .as[(String, Long)].collect()
    hitters.foreach { case (w, c) =>
      require(sketch.contains(w),
        s"heavy hitter '$w' (count $c > ${n / k}) missing from the sketch")
    }
    spark.createDataset(hitters.toSeq.sorted).toDF("word", "cnt")
  }

  /** [[heavyHitters]] per GROUP (one Misra–Gries summary per language/
    * source, via `groupByKey(...).mapValues(word).agg(sketch)` — the
    * realistic production shape: a sketch PER KEY, each partial-agg
    * bounded at k−1 counters, so ten thousand groups cost ten thousand
    * small maps, not ten thousand shuffled token streams). The output is
    * each group's exact-counted >n_g/k tokens — deterministic and
    * SQL-oracle-able, like the global version.
    *
    * Unlike the global version (whose collects are bounded by the FIXED
    * k), nothing here touches the driver: both Misra–Gries guarantees
    * are verified IN-QUERY, per row, the way q98 checks Count–Min —
    * so keying by a high-cardinality column (URL domain at 100 TB) is
    * safe. Overestimate/slack bounds ride the candidate⋈exact join; a
    * heavy hitter missing from its group's sketch would surface through
    * the anti-join guard branch, which fails the job on its first row.
    */
  def heavyHittersByGroup(docs: DataFrame, k: Int = 30,
      groupCol: String = "lang", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs
      .select(col(groupCol).as("grp"),
        explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
    // one sketch row per group, each ≤ k-1 counters — stays distributed
    val cand = toks
      .as[(String, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(graft.functions.MisraGriesAggregator(k).toColumn)
      .toDF("grp", "sketch")
      .select(col("grp"), explode(col("sketch")).as(Seq("word", "est")))
    val exact = toks.groupBy("grp", "word").agg(count(lit(1)).as("cnt"))
    val totals = toks.groupBy("grp").agg(count(lit(1)).as("total"))
    // MG bound (est ≤ exact ≤ est + n_g/k) require-checked per
    // candidate row, executor-side
    val verified = cand
      .join(exact, Seq("grp", "word"))
      .join(totals, Seq("grp"))
      .as[(String, String, Long, Long, Long)]
      .map { case (g, w, est, ex, total) =>
        require(est <= ex && ex - est <= total / k,
          s"MG bound violated for ($g,'$w'): est=$est exact=$ex n/k=${total / k}")
        (g, w, ex, total)
      }
      .toDF("grp", "word", "cnt", "total")
    val hitters = verified
      .filter(expr(s"cnt > (total DIV $k)"))
      .select(col("grp"), col("word"), col("cnt"))
    // coverage guarantee: every exact >n_g/k token must be among its
    // group's candidates — the anti-join is empty when it holds, and any
    // row reaching the guard map fails the job with the culprit named
    val missing = exact
      .join(totals, Seq("grp"))
      .filter(expr(s"cnt > (total DIV $k)"))
      .join(cand.select("grp", "word"), Seq("grp", "word"), "left_anti")
      .as[(String, String, Long, Long)]
      .map { case (g, w, c, _) =>
        require(false,
          s"heavy hitter ($g,'$w') count $c missing from its group sketch")
        (g, w, c)
      }
      .toDF("grp", "word", "cnt")
    hitters.unionByName(missing)
      .select(col("grp").as(groupCol), col("word"), col("cnt"))
      .orderBy(groupCol, "word")
  }

  /** Count–Min token-frequency estimates beside the exact counts — the
    * never-underestimates dual of [[heavyHitters]] (see
    * [[graft.functions.CountMinAggregator]]): one fixed-size sketch
    * pass over the token stream, then the estimate for every vocab
    * token computed map-side from the broadcast sketch, with the CM
    * invariant `estimate ≥ exact` require-checked per row (a violation
    * fails the job loudly — it would mean the sketch math is wrong).
    * Sketch content is merge-order-independent, so `cm_est` is
    * deterministic under any partitioning.
    */
  def cmTokenEstimates(docs: DataFrame, depth: Int = 4, width: Int = 1024,
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
    val sketch: Array[Long] = toks.as[String]
      .select(graft.functions.CountMinAggregator(depth, width).toColumn)
      .head()
    val bc = spark.sparkContext.broadcast(sketch)
    toks.groupBy("word").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
      .map { case (w, c) =>
        val est = graft.functions.CountMinAggregator
          .estimate(bc.value, depth, width, w)
        require(est >= c, s"CM underestimated '$w': $est < $c")
        (w, c, est)
      }
      .toDF("word", "cnt", "cm_est")
  }

  /** Deflate compression ratio per doc, in permille — the
    * gibberish/boilerplate signal RefinedWeb and MassiveText-style
    * filters threshold on: natural prose compresses to ~400-600‰,
    * repeated boilerplate far below, random noise near 1000‰. Map-only
    * typed pass; `Deflater` at a fixed level is deterministic for a
    * given input (same zlib algorithm everywhere), so the output is
    * stable across runs — but zlib's output is not SQL-reproducible, so
    * the q101 check is rows-only with closed-form monotonicity pinned
    * in the spec.
    */
  def compressionStats(docs: DataFrame, level: Int = 6,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("id"), col(textCol))
      .as[(Long, String)]
      .map { case (id, t) =>
        val bytes = (if (t == null) "" else t)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val d = new java.util.zip.Deflater(level)
        d.setInput(bytes)
        d.finish()
        // deflate's worst case EXPANDS the input (~5 bytes per 16 KiB
        // stored block + header/trailer); an undersized buffer would
        // make deflate() return 0 forever once it fills, spinning the
        // drain loop — so size it with the proper zlib bound
        val out = new Array[Byte](bytes.length + bytes.length / 16383 * 5 + 64)
        var n = 0
        while (!d.finished()) n += d.deflate(out, n, out.length - n)
        d.end()
        val permille =
          if (bytes.isEmpty) 1000L else 1000L * n / bytes.length
        (id, bytes.length.toLong, n.toLong, permille)
      }
      .toDF(idCol, "n_bytes", "n_compressed", "compress_permille")
  }

  /** Corpus vocabulary with document frequencies, top `k` by df: the
    * tokenizer-vocab / stopword-discovery staple. Per-doc distinct
    * tokens (array_distinct before the explode — a doc never counts a
    * token twice) then one count per token; map-side partial aggregation
    * makes the shuffle carry at most |vocab| rows per partition, and the
    * final top-k is a TakeOrdered, not a global sort. Ties broken by
    * token so the result is deterministic cross-engine.
    */
  def tokenDf(docs: DataFrame, k: Int = 100,
      textCol: String = "text"): DataFrame =
    docs
      .select(explode(array_distinct(tokens(col(textCol)))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("word"))
      .limit(k)

  /** Unigram-LM quality score (the CCNet/Wikipedia-LM filtering shape):
    * every doc scored by how probable its tokens are under an
    * add-1-smoothed unigram model trained on a REFERENCE slice of the
    * corpus — the "does this look like the good subset" signal quality
    * filters threshold on.
    *
    * Cross-engine exactness: the score is the arithmetic-mean smoothed
    * probability, computed as ONE exact integer sum per doc followed by
    * ONE double division —
    *
    *   score(d) = Σ_{t ∈ d} (c_ref(t) + 1)  /  (n_d · (T + V))
    *
    * where c_ref is the token's reference count (0 if unseen), T the
    * reference token total and V its vocabulary size. The numerator and
    * denominator are exact Longs, so the division is a single correctly
    * rounded IEEE op — bit-identical in any engine, immune to float
    * summation order. The classic geometric-mean/log-perplexity variant
    * is [[lmLogScore]], unit-pinned instead of oracled (ln is not
    * correctly rounded across libm implementations).
    *
    * Scale shape: the model is a (token, count) table joined onto the
    * exploded corpus — vocabulary-sized, so at 100 TB it broadcast-joins
    * only if the vocab allows and otherwise shuffles on the Zipf-skewed
    * token key (AQE skew-split territory, same join shape TfIdfSkewSpec
    * pins); per-doc sums are map-side partial; T and V enter the plan as
    * a broadcast 1-row aggregate, never a driver-side count (the lazy-N
    * rule topTermsLogIdf follows).
    */
  def lmScore(docs: DataFrame, ref: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val tok = explode(tokens(col(textCol))).as("token")
    val refCounts = ref
      .select(tok)
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("c_ref"))
    val stats = refCounts
      .agg(sum("c_ref").as("lm_t"), count(lit(1)).as("lm_v"))
    val docToks = docs
      .select(col(idCol).as("doc_id"), tok)
      .filter(col("token") =!= "")
    docToks
      .join(refCounts, Seq("token"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(coalesce(col("c_ref"), lit(0L)) + lit(1L)).as("smoothed_hits"))
      .crossJoin(broadcast(stats))
      .withColumn("lm_score",
        col("smoothed_hits").cast("double") /
          (col("n_tokens") * (col("lm_t") + col("lm_v"))).cast("double"))
      .select("doc_id", "n_tokens", "smoothed_hits", "lm_score")
  }

  /** Geometric-mean variant of [[lmScore]]: mean ln p(token), the
    * negated per-token log-perplexity. Same plan shape; not oracled
    * (see lmScore doc) — closed-form unit coverage instead.
    */
  def lmLogScore(docs: DataFrame, ref: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val tok = explode(tokens(col(textCol))).as("token")
    val refCounts = ref
      .select(tok)
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("c_ref"))
    val stats = refCounts
      .agg(sum("c_ref").as("lm_t"), count(lit(1)).as("lm_v"))
    docs
      .select(col(idCol).as("doc_id"), tok)
      .filter(col("token") =!= "")
      .join(refCounts, Seq("token"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("ln_p",
        log((coalesce(col("c_ref"), lit(0L)) + lit(1L)).cast("double") /
          (col("lm_t") + col("lm_v")).cast("double")))
      .groupBy("doc_id")
      .agg((sum("ln_p") / count(lit(1))).as("mean_ln_p"))
  }

  /** Within-document repeated n-gram span removal — the fine-grained
    * repetition cleanup of C4 (Raffel et al. 2020 drop duplicate
    * three-sentence spans; here the unit is the word n-gram, the
    * granularity the fixture's sentence-free token streams support).
    * A token is dropped when ANY n-gram covering it is a repeat of an
    * earlier occurrence of the same n-gram in the SAME document; the
    * first occurrence of every span always survives, so a document is
    * never emptied. Documents whose text is entirely whitespace vanish
    * from the output (no tokens to keep) — documented contract.
    *
    * Scale shape: every window/shuffle is keyed by `doc_id` (or
    * `doc_id, gram`), so state per task is bounded by the longest
    * DOCUMENT, never the corpus — the same per-doc-bounded contract as
    * `EventAnalytics.sessionize`. Reassembly is one `array_sort` over
    * the kept tokens of a doc.
    */
  def dropRepeatedNgrams(docs: DataFrame, n: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 2, s"n-gram size must be >= 2, got $n")
    val byPos = Window.partitionBy(idCol).orderBy("pos")
    val toks = docs
      .select(col(idCol),
        posexplode(tokens(col(textCol))).as(Seq("pos", "word")))
      .filter(col("word") =!= "")
    // the n-gram STARTING at each position (null in the final n-1 slots)
    val gram = toks.withColumn("gram",
      when(lead("word", n - 1).over(byPos).isNotNull,
        concat_ws(" ",
          (0 until n).map(i => lead(col("word"), i).over(byPos)): _*)))
    val byGram = Window.partitionBy(col(idCol), col("gram")).orderBy("pos")
    val flagged = gram.withColumn("rep",
      when(col("gram").isNotNull &&
        row_number().over(byGram) > 1, 1).otherwise(0))
    // a token at pos p is covered by grams starting at p-(n-1)..p;
    // positions are consecutive per doc, so a rows frame is exact
    val cover = byPos.rowsBetween(-(n - 1), 0)
    flagged
      .withColumn("covered", max("rep").over(cover))
      .withColumn("n_before", count(lit(1)).over(Window.partitionBy(idCol)))
      .filter(col("covered") === 0)
      .groupBy(col(idCol), col("n_before"))
      .agg(
        count(lit(1)).as("n_after"),
        array_join(
          expr("transform(array_sort(collect_list(struct(pos, word))), x -> x.word)"),
          " ").as("clean_text"))
      .select(col(idCol), col("n_before"), col("n_after"), col("clean_text"))
  }

  /** C0/C1-ish control characters stripped by [[normalizeText]]. The
    * class is written with syntax whose semantics match between Java
    * regex and RE2-family engines so the oracle runs the same pattern.
    */
  val ControlCharClass = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Unicode text normalization: NFC canonical composition (native
    * codegen Expression, [[graft.functions.NfcNormalizeExpression]]),
    * control-character stripping, then whitespace collapse + trim — in
    * that order, so the \x0B the control strip removes never reaches the
    * whitespace class (the one code point where Java's `\s` and RE2's
    * `\s` disagree). `removed_chars` counts the character-length delta
    * (control chars + collapsed whitespace + NFC composition shrink).
    *
    * Map-only and fully codegen'd — the 100 TB shape is a projected
    * parquet scan, no shuffle. Requires `GraftFunctions.register` (or
    * the extensions config) for the nfc_normalize expression.
    */
  def normalizeText(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val nfc = graft.functions.GraftFunctions.nfcNormalize(col(textCol))
    val stripped = regexp_replace(nfc, ControlCharClass, "")
    val collapsed = trim(regexp_replace(stripped, "\\s+", " "))
    docs.select(col(idCol), collapsed.as("norm_text"),
      (length(col(textCol)) - length(collapsed)).cast("long")
        .as("removed_chars"))
  }

  /** Full per-document text-analysis projection over a corpus table.
    * The fingerprint column runs as the native codegen'd
    * `rolling_fingerprint` expression (registered here, idempotent) —
    * the whole projection stays inside one WholeStageCodegen span with
    * no UDF boxing on the hot path; [[fingerprintUdf]] remains for
    * callers outside a registered session.
    */
  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val t = col(textCol)
    docs.select(
      col("doc_id"),
      tokenCount(t).as("n_tokens"),
      bpeishTokenCount(t).as("n_subwords"),
      round(avgTokenLen(t), 6).as("avg_token_len"),
      round(stopwordRatio(t), 6).as("stopword_ratio"),
      round(punctRatio(t), 6).as("punct_ratio"),
      qualityScore(t).as("quality"),
      // round 13: lang_pred is the trained NB model via the native
      // lang_id_model expression; null ≡ 'und'
      coalesce(graft.functions.GraftFunctions.langIdModel(t),
        lit(LangId.Unknown)).as("lang_pred"),
      // The native expression is nullIntolerant (NULL text -> NULL);
      // the operator contract (and the DuckDB twin) is fingerprint 0
      // for missing text, matching fingerprintOf(null) == 0.
      coalesce(graft.functions.GraftFunctions.rollingFingerprint(t),
        lit(0L)).as("fingerprint"))
  }
}
