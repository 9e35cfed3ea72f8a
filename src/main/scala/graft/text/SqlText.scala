package graft.text

/** Scala twins of the SQL string-edge semantics the DuckDB oracles use,
  * so typed flatMap/map kernels and Column/SQL formulations tokenize
  * IDENTICALLY on adversarial input.
  *
  * Why this exists (round 14): the round-13 fuzz fixed the
  * Java-`String.trim`-vs-SQL-`trim` divergence in the swept kernels,
  * but five un-swept kernels (Passages, Bpe, WordPiece, Unigram) kept
  * `text.trim` — Java trim strips EVERY char <= U+0020 (U+0001, U+0007,
  * U+001B, ...) from the edges where SQL `trim` strips only spaces, so
  * a crawl document with an edge control char tokenized differently in
  * the engine than in its oracle (and than in the engine's own
  * Column-based paths, which use Spark's space-only `trim` function).
  * The round-14 fuzz corpus emits exactly those strings; these helpers
  * are the single shared definition both kernel styles now call.
  */
object SqlText {

  /** SQL `trim(s)`: strip ' ' (U+0020) only, from both edges — never
    * tabs, newlines, or control chars. Null maps to "" (kernel callers
    * uniformly treat null text as empty).
    */
  def trimSpaces(s: String): String = {
    if (s == null) return ""
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    if (start == 0 && end == s.length) s else s.substring(start, end)
  }

  /** Exact mirror of DuckDB `regexp_split_to_array(trim(s),
    * '[\s\x0B]+')` (and of Spark's `split(trim(col), "\\s+")`, whose
    * default limit -1 keeps trailing empties): spaces-only edge trim,
    * then Java-`\s` split KEEPING leading/trailing empty tokens — a
    * leading tab yields a '' first token, a trailing tab a '' last
    * token, and the empty string yields [""] in both engines.
    */
  def tokensExact(s: String): Array[String] =
    trimSpaces(s).split("\\s+", -1)

  /** Non-empty-token semantics (the round-13 convention, mirrored by
    * `list_filter(..., x -> x <> '')` / `WHERE w <> ''` oracles).
    */
  def tokens(s: String): Array[String] =
    tokensExact(s).filter(_.nonEmpty)
}
