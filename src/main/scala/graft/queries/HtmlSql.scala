package graft.queries

/** DuckDB twins for the [[graft.operators.HtmlExtract]] queries (q154
  * whole-document extraction, q155 jusText-lite block filter).
  *
  * The fixture has no HTML column, so both engines first build one
  * IDENTICALLY from `documents`: title + script (with `<`/`>`/`&&` in
  * its body — the tag regex would misparse it if script removal
  * failed), style, an HTML comment, a nav `<div>` of three links (link
  * density 1000‰ — must be dropped by q155), an `<h1>` carrying
  * `&amp;` (must decode to `&` in kept text), the document text split
  * into `<p>` paragraphs on `'. '`, and a link-heavy footer with
  * `&nbsp;`/`&#39;` entities. The hash compare therefore certifies the
  * DROP path (nav/footer/title gone), the KEEP path (headline +
  * paragraphs survive in order) and the entity decode in one go.
  *
  * Every regex is in the Java∩RE2 intersection dialect (see
  * `HtmlExtract`'s scaladoc): whitespace classes are spelled
  * `[ \t\n\r]`, no capture-group replacements, `(?is)` + lazy
  * quantifiers only. The SQL is assembled by the same
  * strip/decode/collapse combinators the Spark side chains, so the two
  * engines cannot drift one regex at a time.
  */
object HtmlSql {

  /** The synthetic HTML column, from `documents` (SQL side). */
  val htmlExpr: String =
    """'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
      '</title><script type="text/javascript">var t = 1 < 2 && 3 > 2;</script>' ||
      '<style>.nav { color: red; }</style></head><body><!-- chrome -->' ||
      '<div class="nav"><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></div>' ||
      '<h1>' || source || ' &amp; ' || lang || '</h1><p>' ||
      regexp_replace(text, '\. ', '.</p><p>', 'g') || '</p>' ||
      '<div class="footer"><a href="/p">Privacy</a> <a href="/t">Terms</a>&nbsp;&#39;2026&#39;</div></body></html>'"""

  private def inv(e: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace($e,
        '(?s)<!--.*?-->', ' ', 'g'),
        '(?is)<script\\b.*?</script>', ' ', 'g'),
        '(?is)<style\\b.*?</style>', ' ', 'g')"""

  private def strip(e: String): String =
    s"regexp_replace($e, '<[^>]*>', ' ', 'g')"

  private def decode(e: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(regexp_replace($e,
        '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
        '&#39;', '''', 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g')"""

  private def collapse(e: String): String =
    s"trim(regexp_replace($e, '[ \\t\\n\\r]+', ' ', 'g'))"

  private def clean(e: String): String = collapse(decode(strip(e)))

  private def tok(e: String): String =
    s"CAST(CASE WHEN $e = '' THEN 0 ELSE len(string_split($e, ' ')) END AS BIGINT)"

  private val blockSplit =
    """'(?i)</?(?:html|head|body|title|p|div|h[1-6]|ul|ol|li|br|table|tr|td|th|blockquote)\b[^>]*/?>'"""

  /** `array_to_string([], ' ')` is NULL in DuckDB (not `''` as in
    * Spark's `array_join`) — without the coalesce every anchor-free
    * block's `keep` predicate evaluates NULL and silently drops.
    */
  private def anchors(e: String): String =
    s"coalesce(array_to_string(regexp_extract_all($e, '(?is)<a\\b[^>]*>(.*?)</a>', 1), ' '), '')"

  /** q154: whole-document extraction. */
  val extractTextSql: String =
    s"""WITH h AS (SELECT doc_id, $htmlExpr AS html FROM documents),
        x AS (SELECT doc_id, ${clean(inv("html"))} AS clean_text FROM h)
        SELECT doc_id, ${tok("clean_text")} AS n_tokens, clean_text
        FROM x ORDER BY doc_id"""

  /** The jusText-lite block chain as CTEs over `$src(doc_id, html)`:
    * segment → score → classify → reassemble, ending in
    * `perdoc(doc_id, n_blocks, n_kept, n_dropped, clean_text)` (one row
    * per `documents` row). Shared by q155 and the q158 composition so
    * the two oracles cannot drift block semantics apart.
    */
  private def blockCtes(src: String): String =
    s"""c AS (SELECT doc_id, ${inv("html")} AS h2 FROM $src),
        b0 AS (SELECT doc_id, regexp_split_to_array(h2, $blockSplit) AS segs
               FROM c),
        b AS (SELECT doc_id, i - 1 AS pos, segs[i] AS raw
              FROM (SELECT doc_id, segs,
                      unnest(range(1, len(segs) + 1)) AS i FROM b0)),
        s AS (SELECT doc_id, pos,
                ${clean("raw")} AS txt,
                ${clean(anchors("raw"))} AS link_txt
              FROM b),
        t AS (SELECT doc_id, pos, txt,
                ${tok("txt")} AS n_tok, ${tok("link_txt")} AS n_link
              FROM s WHERE txt <> ''),
        k AS (SELECT doc_id, pos, txt,
                (n_tok >= 3 AND 1000 * n_link <= 333 * n_tok) AS keep
              FROM t),
        agg AS (SELECT doc_id,
                  CAST(count(*) AS BIGINT) AS n_blocks,
                  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_kept,
                  string_agg(CASE WHEN keep THEN txt END, chr(10)
                             ORDER BY pos) AS clean_text
                FROM k GROUP BY doc_id),
        perdoc AS (SELECT d.doc_id,
               coalesce(n_blocks, 0) AS n_blocks,
               coalesce(n_kept, 0) AS n_kept,
               coalesce(n_blocks, 0) - coalesce(n_kept, 0) AS n_dropped,
               coalesce(clean_text, '') AS clean_text
               FROM documents d LEFT JOIN agg USING (doc_id))"""

  /** q155: block segmentation + link-density boilerplate filter
    * (thresholds mirrored from `HtmlExtract.extractBlocks` defaults:
    * minTokens = 3, maxLinkPermille = 333).
    */
  val extractBlocksSql: String =
    s"""WITH h AS (SELECT doc_id, $htmlExpr AS html FROM documents),
        ${blockCtes("h")}
        SELECT doc_id, n_blocks, n_kept, n_dropped, clean_text
        FROM perdoc
        ORDER BY doc_id"""

  /** q158: the full ingestion composition — WARC-wrap the HTML payload,
    * re-extract it through the record grammar (certifying the
    * header/payload split feeds downstream intact), run the block
    * chain, then per-(lang, source) accounting over the docs whose
    * cleaned text still has ≥ 30 tokens. Clean-text tokens split on
    * `[ \n]+` — blocks join with `\n`, tokens inside a block with
    * spaces.
    */
  val ingestPipelineSql: String =
    s"""WITH h0 AS (SELECT doc_id, $htmlExpr AS html FROM documents),
        w AS (SELECT doc_id,
          'WARC/1.0' || chr(13) || chr(10) ||
          'WARC-Type: response' || chr(13) || chr(10) ||
          'WARC-Target-URI: https://example' ||
            CAST(doc_id % 7 AS VARCHAR) || '.com/page/' ||
            CAST(doc_id AS VARCHAR) || chr(13) || chr(10) ||
          'Content-Length: ' || CAST(length(html) AS VARCHAR) ||
            chr(13) || chr(10) || chr(13) || chr(10) || html AS record
          FROM h0),
        pp AS (SELECT doc_id,
          regexp_replace(record, '(?s)^.*?\r\n\r\n', '') AS html
          FROM w),
        ${blockCtes("pp")},
        tokc AS (SELECT doc_id, n_blocks, n_kept,
          CAST(CASE WHEN clean_text = '' THEN 0
               ELSE len(string_split_regex(clean_text, '[ \n]+'))
               END AS BIGINT) AS n_clean_toks
          FROM perdoc)
        SELECT lang, source,
               CAST(count(*) AS BIGINT) AS n_docs_kept,
               CAST(sum(n_blocks) AS BIGINT) AS sum_blocks,
               CAST(sum(n_kept) AS BIGINT) AS sum_kept_blocks,
               CAST(sum(n_clean_toks) AS BIGINT) AS sum_clean_toks
        FROM tokc JOIN documents USING (doc_id)
        WHERE n_clean_toks >= 30
        GROUP BY lang, source
        ORDER BY lang, source"""
}
