package graft.streaming

import graft.Triple
import graft.text.{BiarcParser, PathExtractor}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Incremental DIRT (SURVEY.md §2.7): the pipeline's base statistics are
  * monotone weighted counts, so the extraction stage runs unchanged over
  * a corpus STREAM — same parse/extract kernels inside the same typed
  * flatMaps, with the triple aggregation maintained as streaming state.
  * Margins, N and MI stay derivable from the continuously-updated triples
  * (recomputed per trigger or on demand), exactly as in batch.
  */
object DirtStreaming {

  /** Corpus lines (streaming or batch) -> continuously aggregated
    * (path, slot, word, cnt) triples. On a stream, use outputMode
    * "update"/"complete"; state is keyed by the triple, bounded by
    * vocabulary — the same cardinality the batch shuffle carries.
    */
  def streamingTriples(lines: Dataset[String]): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines
      .flatMap(BiarcParser.parseLine(_))
      .flatMap(PathExtractor.extract(_))
      .flatMap(pi => Seq(
        Triple(pi.path, "X", pi.x, pi.cnt),
        Triple(pi.path, "Y", pi.y, pi.cnt)))
      .groupBy("path", "slot", "word")
      .agg(sum("cnt").as("cnt"))
  }
}
