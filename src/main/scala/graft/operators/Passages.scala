package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.Ids

/** Passage-level (sub-document) deduplication for LLM training corpora.
  *
  * Document-level dedup (exact digests, Jaccard, MinHash — [[Dedup]])
  * misses the dominant real-world duplication mode: two distinct pages
  * sharing a boilerplate paragraph, a quoted passage, or a syndicated
  * article body. The published remedies are
  *
  *   - exact substring dedup ("Deduplicating Training Data Makes
  *     Language Models Better", Lee et al. 2022): find spans of ≥ n
  *     tokens that occur in more than one document —
  *     [[duplicatePassageStats]] measures per-document contamination by
  *     duplicated n-token spans (their suffix-array formulation is a
  *     single-machine design; the relational shape below is the
  *     MapReduce-style equivalent that scales out);
  *   - paragraph-hash dedup (CCNet, Wenzek et al. 2020): hash each
  *     paragraph, drop paragraphs seen in more than one document —
  *     [[dedupChunks]], with a deterministic fixed-width word chunker
  *     standing in for the newline splitter on corpora without line
  *     structure (the fixture corpus is single-line).
  *
  * Both are two-shuffle plans: one distinct-count on a fixed-width
  * 16-byte md5 key (never on raw passage text — at 100 TB the shuffle
  * carries digests, not passages), one re-aggregation by doc id. The
  * doc-frequency count is `count(distinct id)`, which Spark plans as a
  * two-level aggregate keyed (digest, id) first — a boilerplate chunk
  * shared by a billion pages partial-aggregates map-side instead of
  * funnelling one hot digest through one task. md5 collisions (2⁻¹²⁸)
  * would merge unrelated passages; accepted and documented, same
  * adjudication as [[Dedup.exactDupGroups]].
  */
object Passages {

  /** (id, pos, gram) — one row per overlapping word n-gram occurrence,
    * with its 0-based start position. Typed flatMap: the Column
    * formulation (`posexplode(transform(sequence(...), slice/concat))`)
    * is interpreted per gram and measured ~6× slower in [[Dedup]]'s
    * equivalent tokenizer. Docs shorter than n words emit nothing.
    */
  private def posGrams(docs: DataFrame, n: Int, textCol: String,
      idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(Ids.longId(idCol).as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        // exact SQL-split mirror (round 14): spaces-only trim + keep
        // edge empty tokens, matching the q80/q149/q152 oracles'
        // regexp_split_to_array(trim(text), ...) on control-char edges
        val w = graft.text.SqlText.tokensExact(t)
        if (w.length < n) Iterator.empty
        else (0 to w.length - n).iterator
          .map(i => (id, i, w.slice(i, i + n).mkString(" ")))
      }
      .toDF("id", "pos", "gram")
  }

  /** Per-document contamination by duplicated n-token passages: for each
    * doc, how many of its overlapping word n-grams also occur in at
    * least `minDocs - 1` OTHER documents, and how many of its token
    * positions those duplicated spans cover (interval union, counted by
    * exploding each span's positions and distinct-counting — spans at
    * adjacent positions overlap, so a plain sum would double-count).
    *
    * Output per input doc: `doc_id, n_tokens, n_grams, n_dup_grams,
    * dup_covered_tokens, dup_permille` — all integers, so the result is
    * hash-exact against any SQL twin. Callers drop or trim docs above a
    * `dup_permille` threshold (Lee et al. cut the spans themselves;
    * span surgery needs the grouped positions this emits).
    *
    * Scale: gram rows are O(total tokens) and map-side only; the df
    * count shuffles md5 digests (16 B/key); duplicated positions — in
    * practice a small fraction of the corpus — shuffle again by doc id.
    * No windows, no driver state.
    */
  def duplicatePassageStats(docs: DataFrame, n: Int = 5,
      minDocs: Int = 2, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val grams = posGrams(docs, n, textCol, idCol)
    val dupKeys = grams
      .groupBy(md5(col("gram")).as("digest"))
      .agg(countDistinct(col("id")).as("df"))
      .filter(col("df") >= minDocs)
      .select("digest")
    val dupPos = grams
      .join(dupKeys, md5(col("gram")) === dupKeys("digest"))
      .select(col("id"), col("pos"))
    val covered = dupPos
      .select(col("id"), col("pos"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("tokidx"))
      .groupBy("id")
      .agg(
        countDistinct(col("pos")).as("n_dup_grams"),
        countDistinct(col("tokidx")).as("dup_covered_tokens"))
    docs
      .select(
        Ids.longId(idCol).as("id"),
        size(split(trim(col(textCol)), "\\s+")).cast("long").as("n_tokens"))
      .join(covered, Seq("id"), "left")
      .select(
        col("id").as("doc_id"),
        col("n_tokens"),
        when(col("n_tokens") >= n, col("n_tokens") - (n - 1))
          .otherwise(lit(0L)).cast("long").as("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("dup_covered_tokens"), lit(0L)).as("dup_covered_tokens"))
      .withColumn("dup_permille",
        expr("CASE WHEN n_tokens > 0 THEN (1000 * dup_covered_tokens) DIV n_tokens ELSE 0 END"))
  }

  /** The span-surgery step of Lee et al. 2022: REMOVE every token
    * covered by a duplicated n-gram (one occurring in ≥ `minDocs`
    * documents), keeping the survivors in original order — the step
    * [[duplicatePassageStats]] only measures. Overlapping and adjacent
    * duplicated spans merge naturally because removal is by the
    * distinct covered POSITION set, not by span arithmetic.
    *
    * Output per input doc: `(doc_id, n_tokens, n_kept, n_removed,
    * clean_text)`; a fully-duplicated doc keeps `clean_text = ""`.
    *
    * Scale shape, same as the stats pass: gram rows are map-only
    * O(total tokens), the duplicate test shuffles 16-byte digests, and
    * only the (small-in-practice) covered positions + the token stream
    * shuffle by doc id. The reassembly sorts WITHIN one doc's
    * collected token structs (bounded by doc length, the same
    * per-document bound every map-side text operator here relies on) —
    * no window over the corpus.
    */
  def removeDuplicateSpans(docs: DataFrame, n: Int = 5, minDocs: Int = 2,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val grams = posGrams(docs, n, textCol, idCol)
    val dupKeys = grams
      .groupBy(md5(col("gram")).as("digest"))
      .agg(countDistinct(col("id")).as("df"))
      .filter(col("df") >= minDocs)
      .select("digest")
    val covered = grams
      .join(dupKeys, md5(col("gram")) === dupKeys("digest"))
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("tokidx"))
      .distinct()
    val toks = docs
      .select(Ids.longId(idCol).as("id"),
        posexplode(split(trim(col(textCol)), "\\s+")))
      .withColumnRenamed("pos", "tokidx")
      .withColumnRenamed("col", "tok")
    val cleaned = toks
      .join(covered, Seq("id", "tokidx"), "left_anti")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("tokidx"), col("tok")))),
            x => x.getField("tok")),
          " ").as("clean_text"))
    docs
      .select(Ids.longId(idCol).as("id"),
        size(split(trim(col(textCol)), "\\s+")).cast("long").as("n_tokens"))
      .join(cleaned, Seq("id"), "left")
      .select(
        col("id").as("doc_id"),
        col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** (id, idx, chunk) — consecutive `width`-word chunks in document
    * order (the last chunk may be shorter). An empty or null text is one
    * empty chunk, matching `regexp_split_to_array('', '\s+') = ['']` in
    * SQL twins.
    */
  private def chunks(docs: DataFrame, width: Int, textCol: String,
      idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(Ids.longId(idCol).as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        // exact SQL-split mirror (round 14) — see posGrams; preserves
        // the documented empty-chunk behavior ('' -> one '' chunk)
        graft.text.SqlText.tokensExact(t)
          .grouped(width).zipWithIndex
          .map { case (ws, i) => (id, i, ws.mkString(" ")) }
      }
      .toDF("id", "idx", "chunk")
  }

  /** CCNet-style chunk-level dedup: split every doc into deterministic
    * `width`-word chunks, drop each chunk whose text occurs in at least
    * `minDocs` DISTINCT documents (cross-document boilerplate; purely
    * intra-document repetition is [[TextAnalysis.repetitionStats]]'
    * domain and is kept), and reassemble the survivors in document
    * order. Dropping is by chunk text, so when a chunk is duplicated
    * across docs, every occurrence in every doc goes — no "first doc
    * keeps it" asymmetry, which keeps the operator order-independent
    * and therefore deterministic under any partitioning.
    *
    * Output per input doc (docs whose every chunk was dropped stay,
    * with `clean_text = ''`): `doc_id, n_chunks, n_kept, clean_text`.
    *
    * Reassembly is a per-doc `sort_array(collect_list(struct(idx, …)))`
    * — bounded by the doc's own chunk count, never a window over an
    * unbounded key.
    */
  def dedupChunks(docs: DataFrame, width: Int = 10, minDocs: Int = 2,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val ch = chunks(docs, width, textCol, idCol)
    val dupDigests = ch
      .groupBy(md5(col("chunk")).as("digest"))
      .agg(countDistinct(col("id")).as("df"))
      .filter(col("df") >= minDocs)
      .select("digest")
    val kept = ch.join(dupDigests, md5(col("chunk")) === dupDigests("digest"),
      "left_anti")
    val total = ch.groupBy("id").agg(count(lit(1)).as("n_chunks"))
    val rebuilt = kept
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(
            sort_array(collect_list(struct(col("idx"), col("chunk")))),
            _.getField("chunk")),
          " ").as("clean_text"))
    total
      .join(rebuilt, Seq("id"), "left")
      .select(
        col("id").as("doc_id"),
        col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Cross-source contamination matrix: for every pair of sources, the
    * number of DISTINCT word n-grams occurring in both — the "did crawl
    * B re-scrape crawl A" lineage signal that decides which source to
    * down-weight before any per-document dedup runs. Output is
    * |sources|² at most, so the whole result is a dashboard-sized
    * table regardless of corpus size.
    *
    * Scale shape: the corpus collapses once to DISTINCT (digest,
    * source) rows — the same partial-aggregate absorption as
    * [[duplicatePassageStats]], keyed by the 16-byte digest, never raw
    * gram text — and the pair join is digest-keyed with ≤ |sources|
    * rows per key, so its output is bounded by |sources|² per digest,
    * not by document count. No window, no cartesian.
    */
  def sourceOverlapMatrix(docs: DataFrame, n: Int = 5,
      textCol: String = "text", srcCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    val grams = posGrams(docs, n, textCol, idCol)
    val bySrc = grams
      .join(docs.select(Ids.longId(idCol).as("id"), col(srcCol).as("src")),
        Seq("id"))
      .select(md5(col("gram")).as("digest"), col("src"))
      .distinct()
    bySrc.as("a")
      .join(bySrc.as("b"),
        col("a.digest") === col("b.digest") && col("a.src") < col("b.src"))
      .select(col("a.src").as("source_a"), col("b.src").as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** RefinedWeb-style SENTENCE-level exact dedup (Penedo et al. 2023
    * §3.2 "exact substring+sentence filtering" family): split each doc
    * on terminator runs `[.!?]+`, normalize (lower + squeezed
    * whitespace + trim), and keep only the GLOBALLY FIRST occurrence of
    * each normalized sentence — first by (doc_id, position), the
    * deterministic keeper rule — dropping every later cross-doc (and
    * within-doc) repeat. The granularity complements the family above:
    * q80/q149 catch fixed-width token spans, [[dedupChunks]] fixed
    * word windows; boilerplate usually repeats as whole SENTENCES
    * whose length varies, which neither fixed width matches cleanly.
    *
    * Scale shape: one partial-aggregated min(struct(id, pos)) keyed by
    * the 16-byte sentence digest (a boilerplate sentence on a billion
    * pages combines map-side — the digest never funnels raw text or a
    * hot single task), one digest-keyed join back, one per-doc
    * re-aggregation. No global window anywhere (the SQL twin's
    * row_number is DuckDB-local idiom; the Spark plan is agg + join).
    * Per-doc output: sentence counts and the reassembled kept text in
    * original order.
    */
  def dropDuplicateSentences(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val sents = docs
      .select(Ids.longId(idCol).as("id"),
        posexplode(split(col(textCol), "[.!?]+")))
      .select(col("id"), col("pos").cast("long").as("pos"),
        trim(regexp_replace(lower(col("col")), "\\s+", " ")).as("norm"))
      .filter(col("norm") =!= "")
    val firsts = sents
      .groupBy(md5(col("norm")).as("digest"))
      .agg(min(struct(col("id"), col("pos"))).as("first"))
      .select(col("digest"), col("first.id").as("kid"),
        col("first.pos").as("kpos"))
    val flagged = sents
      .join(firsts, md5(col("norm")) === firsts("digest"))
      .withColumn("keep", col("id") === col("kid") && col("pos") === col("kpos"))
    val agg = flagged
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_sentences"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            sort_array(collect_list(
              when(col("keep"), struct(col("pos"), col("norm"))))),
            _.getField("norm")),
          ". ").as("clean_text"))
    docs
      .select(Ids.longId(idCol).as("id"))
      .join(agg, Seq("id"), "left")
      .select(
        col("id").as("doc_id"),
        coalesce(col("n_sentences"), lit(0L)).as("n_sentences"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (coalesce(col("n_sentences"), lit(0L)) -
          coalesce(col("n_kept"), lit(0L))).as("n_dup"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
