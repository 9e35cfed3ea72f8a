package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the retrieval-corpus preparation
  * step (split every document into overlapping fixed-size token windows
  * so an embedder/retriever sees bounded, boundary-robust passages).
  *
  * Map-only by construction: tokenize, compute the chunk count
  * closed-form, `explode(sequence(...))` the chunk indexes, slice the
  * token array per chunk — one projected scan, zero shuffles, every
  * expression codegen'd. A 100 TB corpus chunks at full scan speed and
  * the fan-out factor is bounded by `ceil((n-window)/stride)+1` per
  * document, so output size is predictable from token counts.
  */
object Chunking {

  /** Overlapping chunks of `window` whitespace tokens every `stride`
    * tokens (`stride` ≤ `window` ⇒ every token lands in ≥1 chunk; the
    * final chunk may be shorter — it always reaches the document's last
    * token). Output: `(doc_id, chunk_idx, token_start, token_end,
    * chunk_text)` with 1-based inclusive token spans.
    */
  def slidingChunks(docs: DataFrame, window: Int = 50, stride: Int = 40,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    docs
      .select(col(idCol), split(col(textCol), " ").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("chunk_idx",
        explode(sequence(lit(0L), greatest(lit(0L),
          ceil((col("n") - window) / lit(stride.toDouble)).cast("long")))))
      .select(
        col(idCol),
        col("chunk_idx"),
        (col("chunk_idx") * stride + 1).as("token_start"),
        least(col("chunk_idx") * stride + window, col("n")).as("token_end"),
        array_join(
          slice(col("toks"), (col("chunk_idx") * stride + 1).cast("int"),
            lit(window)), " ").as("chunk_text"))
  }

  /** Content-defined chunking (the rsync/LBFS/FastCDC family, Muthitacharoen
    * et al. 2001): split each document where a rolling window hash hits a
    * chosen bit pattern, so chunk boundaries follow CONTENT — an insertion
    * early in a page shifts every fixed-width chunk (q81's failure mode on
    * edited pages) but leaves all content-defined boundaries after it
    * intact, which is what makes chunk-level dedup robust to edits.
    *
    * Boundary rule, deliberately STATELESS: position `i` (1-based, `i > 1`)
    * starts a new chunk iff the k-char Karp–Rabin hash of `text[i, i+k)`
    * has its low `log2(mask+1)` bits zero (`h & mask == 0`; expected chunk
    * length ≈ mask+1 chars). The FastCDC min/max chunk bounds are a
    * sequential-per-document refinement this flatMap could add, but they
    * make the rule history-dependent; the stateless rule keeps every
    * position independently checkable, which is exactly what lets the
    * DuckDB twin (q160) replay boundaries as one relational predicate —
    * same window-sum-in-Z/2^64 identity as `FingerprintSql` (q38).
    *
    * Per-doc sequential scan inside one typed flatMap: map-only, zero
    * shuffles, state bounded by one document. Output: `(id, idx, chunk)` —
    * 0-based chunk index, chunks concatenate back to the exact text (the
    * q160 gate). Empty/null docs emit nothing; docs shorter than `k` are
    * one whole-text chunk.
    */
  def contentDefinedChunks(docs: DataFrame, k: Int = 8, mask: Long = 63L,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k > 0 && mask > 0 && (mask & (mask + 1)) == 0,
      s"mask must be 2^m - 1, got $mask")
    val spark = docs.sparkSession
    import spark.implicits._
    val B = graft.operators.TextAnalysis.FingerprintB
    docs
      .select(graft.util.Ids.longId(idCol).as("id"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, t0) =>
        val t = if (t0 == null) "" else t0
        if (t.isEmpty) Iterator.empty
        else {
          // positions, windows and hashes are in CODE POINTS — the unit
          // the q160 oracle indexes by (ord/substr/length); a boundary
          // can therefore never split a surrogate pair, and astral docs
          // chunk identically in both engines (VERDICT r14 #5). offs
          // maps code-point index -> char offset for the final slices.
          val cps = graft.text.SqlText.codePoints(t)
          val n = cps.length
          val offs = new Array[Int](n + 1)
          var ci0 = 0
          var co = 0
          while (ci0 < n) {
            offs(ci0) = co
            co += Character.charCount(cps(ci0))
            ci0 += 1
          }
          offs(n) = co
          val starts = scala.collection.mutable.ArrayBuffer(0)
          if (n >= k) {
            var pow = 1L
            var j = 0
            while (j < k - 1) { pow *= B; j += 1 }
            var h = 0L
            j = 0
            while (j < k) { h = h * B + cps(j); j += 1 }
            // windows start at 0-based s = 1 .. n-k; boundary BEFORE s
            var s = 1
            while (s <= n - k) {
              h = (h - cps(s - 1) * pow) * B + cps(s + k - 1)
              if ((h & mask) == 0L) starts += s
              s += 1
            }
          }
          val bounds = (starts :+ n).toIndexedSeq
          Iterator.range(0, bounds.length - 1).map { ci =>
            (id, ci.toLong,
              t.substring(offs(bounds(ci)), offs(bounds(ci + 1))))
          }
        }
      }
      .toDF("id", "idx", "chunk")
  }
}
