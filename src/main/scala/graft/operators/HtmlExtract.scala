package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.Ids

/** HTML → text extraction and boilerplate-block filtering — the first
  * stage of every web-crawl training-data pipeline (the role trafilatura
  * / jusText / resiliparse play ahead of CCNet/RefinedWeb-style
  * curation; jusText: Pomikálek 2011, "Removing boilerplate and
  * duplicate content from web corpora").
  *
  * Two surfaces:
  *
  *   - [[extractText]]: whole-document extraction — drop comments /
  *     script / style subtrees, strip tags, decode the common entities,
  *     collapse whitespace. Purely column-level `regexp_replace` chains:
  *     map-only, fully codegen'd, ZERO shuffles at any corpus size.
  *   - [[extractBlocks]]: jusText-lite block classification — segment on
  *     block-level tags, score each block's link density (tokens inside
  *     `<a>` vs all tokens, integer permille so no float crosses an
  *     engine boundary) and length, drop boilerplate (navigation,
  *     footers, short chrome), reassemble the kept blocks in document
  *     order. One shuffle, keyed by doc id; per-key state is bounded by
  *     a single document's block list (the [[Passages]] reassembly
  *     bound) — no corpus-wide window, so a 100 TB crawl partitions
  *     freely by doc.
  *
  * Every regex here is written in the Java∩RE2 dialect intersection the
  * DuckDB oracle twins rely on (the q91/q128 discipline): no
  * capture-group replacements, no `\s` (its `\x0B` membership differs
  * between Java and RE2 — whitespace classes are spelled
  * `[ \t\n\r]`), inline flags `(?is)` and lazy quantifiers only, both
  * supported identically by the two engines.
  *
  * Entity decoding handles the named entities that dominate crawled
  * text (`&lt; &gt; &quot; &#39; &nbsp;`) with `&amp;` decoded LAST —
  * the standard single-pass order, so `&amp;lt;` decodes to the literal
  * text `&lt;` rather than `<`. Unknown entities pass through verbatim
  * (deterministic on both engines by construction).
  */
object HtmlExtract {

  /** `(?s)` — comments may span lines. */
  private[graft] val CommentRe = "(?s)<!--.*?-->"

  /** Script/style subtrees carry NO extractable text, and their bodies
    * routinely contain `<`/`>` (`1 < 2 && 3 > 2`) that the bare tag
    * regex would misparse — they must be dropped before tag stripping.
    */
  private[graft] val ScriptRe = "(?is)<script\\b.*?</script>"
  private[graft] val StyleRe = "(?is)<style\\b.*?</style>"

  private[graft] val TagRe = "<[^>]*>"

  /** Block-level separators (tags that end a text run in every HTML
    * renderer); inline tags (`<a> <b> <span> …`) deliberately absent so
    * a link stays inside its surrounding block for the density score.
    */
  private[graft] val BlockTagRe =
    "(?i)</?(?:html|head|body|title|p|div|h[1-6]|ul|ol|li|br|table|tr|td|th|blockquote)\\b[^>]*/?>"

  /** Anchor CONTENT (group 1) — what a reader sees as link text. */
  private[graft] val AnchorRe = "(?is)<a\\b[^>]*>(.*?)</a>"

  private[graft] val WsRe = "[ \\t\\n\\r]+"

  /** Drop the no-text subtrees: comments, script, style. */
  def removeInvisible(h: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(h, CommentRe, " "),
        ScriptRe, " "),
      StyleRe, " ")

  /** Replace every tag with a separator (NOT ""): `</td><td>` must not
    * glue two cells into one token.
    */
  def stripTags(t: Column): Column = regexp_replace(t, TagRe, " ")

  /** Named-entity decode, `&amp;` last (see object doc). */
  def decodeEntities(t: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(t, "&lt;", "<"),
              "&gt;", ">"),
            "&quot;", "\""),
          "&#39;", "'"),
        "&nbsp;", " "),
      "&amp;", "&")

  def collapseWs(t: Column): Column =
    trim(regexp_replace(t, WsRe, " "))

  /** The whole-document extraction chain. */
  def htmlToText(h: Column): Column =
    collapseWs(decodeEntities(stripTags(removeInvisible(h))))

  /** Token count of an already-collapsed string ("" → 0; collapse
    * guarantees single-space separators, so a plain split suffices).
    */
  private def tokCount(t: Column): Column =
    when(t === lit(""), lit(0L)).otherwise(size(split(t, " ")).cast("long"))

  /** Whole-document extraction: `(doc_id, n_tokens, clean_text)`.
    * Map-only — the plan is one projected scan, no exchange.
    */
  def extractText(docs: DataFrame, htmlCol: String = "html",
      idCol: String = "doc_id"): DataFrame = {
    val txt = htmlToText(col(htmlCol))
    docs.select(
      Ids.longId(idCol).as("doc_id"),
      tokCount(txt).as("n_tokens"),
      txt.as("clean_text"))
  }

  /** jusText-lite boilerplate filter (see object doc). A block is KEPT
    * when it has at least `minTokens` tokens AND its link density —
    * anchor-text tokens per block token — is at most
    * `maxLinkPermille`‰ (the comparison is the integer cross-product
    * `1000·n_link ≤ maxLinkPermille·n_tok`, exact on both engines).
    *
    * Output per input doc: `(doc_id, n_blocks, n_kept, n_dropped,
    * clean_text)` — `n_blocks` counts non-empty blocks, `clean_text`
    * joins kept blocks with `\n` in document order; a doc with nothing
    * kept survives with `n_kept = 0, clean_text = ""`.
    */
  def extractBlocks(docs: DataFrame, maxLinkPermille: Int = 333,
      minTokens: Int = 3, htmlCol: String = "html",
      idCol: String = "doc_id"): DataFrame = {
    val base = docs.select(
      Ids.longId(idCol).as("id"),
      removeInvisible(col(htmlCol)).as("h"))
    val blocks = base.select(col("id"),
      posexplode(split(col("h"), BlockTagRe)).as(Seq("pos", "raw")))
    val scored = blocks
      .withColumn("txt", collapseWs(decodeEntities(stripTags(col("raw")))))
      .filter(col("txt") =!= "")
      .withColumn("n_tok", tokCount(col("txt")))
      .withColumn("link_txt",
        collapseWs(decodeEntities(stripTags(array_join(
          regexp_extract_all(col("raw"), lit(AnchorRe), lit(1)), " ")))))
      .withColumn("n_link", tokCount(col("link_txt")))
      .withColumn("keep",
        col("n_tok") >= lit(minTokens.toLong) &&
          col("n_link") * lit(1000L) <= lit(maxLinkPermille.toLong) * col("n_tok"))
    val agg = scored.groupBy("id").agg(
      count(lit(1)).as("n_blocks"),
      sum(when(col("keep"), lit(1L)).otherwise(lit(0L))).as("n_kept"),
      array_join(
        transform(
          array_sort(collect_list(
            when(col("keep"), struct(col("pos"), col("txt"))))),
          x => x.getField("txt")),
        "\n").as("clean_text"))
    docs.select(Ids.longId(idCol).as("id"))
      .join(agg, Seq("id"), "left")
      .select(
        col("id").as("doc_id"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (coalesce(col("n_blocks"), lit(0L)) -
          coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
