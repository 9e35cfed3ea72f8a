package graft.streaming

import graft.pipeline.DirtPipeline
import org.apache.spark.sql.{DataFrame, Dataset}

/** Incremental DIRT (SURVEY.md §2.7): the pipeline's base statistics are
  * monotone weighted counts, so the extraction stage runs unchanged over
  * a corpus STREAM — same parse/extract kernels inside the same typed
  * flatMaps, with the triple aggregation maintained as streaming state.
  * Margins, N and MI stay derivable from the continuously-updated triples
  * (recomputed per trigger or on demand), exactly as in batch.
  * [[DirtIncremental]] takes the next step: margins, N and the MI join
  * maintained as merged snapshots per micro-batch, with only the
  * batch-touched (path, slot, word) slice re-joined.
  */
object DirtStreaming {

  /** Corpus lines (streaming or batch) -> continuously aggregated
    * (path, slot, word, cnt) triples. On a stream, use outputMode
    * "update"/"complete"; state is keyed by the triple, bounded by
    * vocabulary — the same cardinality the batch shuffle carries.
    */
  def streamingTriples(lines: Dataset[String]): DataFrame =
    // the batch stages compose unchanged — all typed transforms plus one
    // aggregation are streaming-safe, so streamed==batch holds by
    // construction rather than by keeping two copies in sync
    DirtPipeline.triples(
      DirtPipeline.extractInstances(
        DirtPipeline.parseCorpus(lines)))
}
