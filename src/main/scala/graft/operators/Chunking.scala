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
}
