package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.Ids

/** WARC (Web ARChive, ISO 28500) record parsing — the container format
  * every CommonCrawl-derived corpus arrives in, and the step ahead of
  * [[HtmlExtract]] in a crawl ingestion pipeline: split the header
  * section from the payload, extract the typed header fields
  * (`WARC-Type`, `WARC-Record-ID`, `WARC-Target-URI`,
  * `Content-Length`), and validate the declared length against the
  * payload actually present (truncated-record detection — the standard
  * crawl-corruption check).
  *
  * Pure column-level regex/string functions: map-only, fully codegen'd,
  * zero shuffles at any corpus size — each record parses independently,
  * so a 100 TB WARC collection partitions freely. Patterns are in the
  * Java∩RE2 intersection dialect (see [[HtmlExtract]]'s scaladoc): the
  * header/payload boundary is the first blank line (`\r\n\r\n`),
  * consumed by one anchored lazy match.
  *
  * Real WARC files are gzip-per-record; the decompression (a
  * container-level concern Spark's text/binaryFile sources handle)
  * is out of scope here — this operator owns the RECORD grammar.
  */
object Warc {

  /** The header section: everything before the first blank line. Header
    * extraction MUST be scoped here — matching the whole record would
    * let a payload line like `Content-Length: 0` masquerade as a header
    * when the real header is absent.
    */
  private def headerSection(rec: Column): Column =
    regexp_replace(rec, "(?s)\\r\\n\\r\\n.*$", "")

  private def header(rec: Column, name: String): Column =
    regexp_extract(headerSection(rec), "(?m)^" + name + ": ([^\\r\\n]+)", 1)

  /** Payload = everything after the first blank line. The `^`-anchored
    * lazy match admits exactly one occurrence, so replace-first and
    * replace-all semantics coincide across engines.
    */
  def payload(rec: Column): Column =
    regexp_replace(rec, "(?s)^.*?\\r\\n\\r\\n", "")

  /** Parse one WARC record per row: typed header fields, payload digest
    * and the declared-vs-actual length check. Output:
    * `(doc_id, warc_type, record_id, target_uri, content_length,
    * payload_len, len_ok, payload_md5)`.
    */
  def parseRecords(df: DataFrame, recordCol: String = "record",
      idCol: String = "doc_id"): DataFrame = {
    val rec = col(recordCol)
    val pay = payload(rec)
    df.select(
      Ids.longId(idCol).as("doc_id"),
      header(rec, "WARC-Type").as("warc_type"),
      regexp_extract(headerSection(rec),
        "(?m)^WARC-Record-ID: <([^>]+)>", 1).as("record_id"),
      header(rec, "WARC-Target-URI").as("target_uri"),
      header(rec, "Content-Length").cast("long").as("content_length"),
      length(pay).cast("long").as("payload_len"),
      (header(rec, "Content-Length").cast("long") ===
        length(pay).cast("long")).as("len_ok"),
      md5(pay.cast("binary")).as("payload_md5"))
  }
}
