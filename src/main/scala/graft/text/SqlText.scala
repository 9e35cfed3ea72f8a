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

  /** Unicode CODE POINTS of `s` (null → empty) — the unit DuckDB's
    * `length`/`substr`/`unicode`/`ord` index by. Java Strings are
    * UTF-16, so `charAt`/`length` see surrogate PAIRS for
    * supplementary-plane text (emoji, CJK-B) where SQL sees one code
    * point — the round-15 fuzz class (VERDICT r14 #5). Any kernel that
    * hashes, counts or slices per-character against a SQL twin must
    * iterate THIS array, not chars; for BMP text the two are identical,
    * which is what keeps every frozen pin stable under the migration.
    */
  def codePoints(s: String): Array[Int] = {
    if (s == null) return Array.empty
    val n = s.length
    val out = new Array[Int](s.codePointCount(0, n))
    var i = 0
    var k = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      out(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** SQL `length(s)`: code points, not UTF-16 units. */
  def cpLength(s: String): Int =
    if (s == null) 0 else s.codePointCount(0, s.length)

  /** Char offset of each code-point index, plus the end offset — the
    * bridge from SQL-unit positions (code points) back to Java
    * `substring` arguments: the piece at code-point span [i, j) is
    * `s.substring(offs(i), offs(j))`, and it can never split a
    * surrogate pair.
    */
  def cpOffsets(s: String): Array[Int] = {
    if (s == null) return Array(0)
    val n = s.length
    val out = new Array[Int](s.codePointCount(0, n) + 1)
    var i = 0
    var k = 0
    while (i < n) {
      out(k) = i
      i += Character.charCount(s.codePointAt(i))
      k += 1
    }
    out(k) = n
    out
  }

  /** Code-point twin of `MurmurHash3.stringHash`: the same
    * two-units-per-mix-round pipeline (pair packed as
    * `(a << 16) + b`, odd tail via mixLast, length into the
    * finalizer), but iterating CODE POINTS — exactly what the DuckDB
    * replay (`HashSql.murmurCtes`: `unicode(substr(w, i, 1))` rounds,
    * `length(w)` finalizer) computes. For BMP strings every round sees
    * identical inputs to `stringHash`, so hashes — and every frozen
    * artifact derived from them — are bit-identical to the pre-round-15
    * kernels; astral tokens now agree with the oracle instead of
    * diverging (the BMP-only precondition HashSql documented).
    */
  def murmurCp(s: String, seed: Int): Int = {
    import scala.util.hashing.MurmurHash3
    // BMP fast path: no surrogates ⇒ code points ARE the UTF-16 units,
    // so the library kernel computes the identical hash with zero
    // allocation — this is the all-ASCII/all-BMP hot loop (minhash
    // shingles, count-min tokens) running at pre-round-15 speed
    var i = 0
    val n = s.length
    while (i < n && !Character.isSurrogate(s.charAt(i))) i += 1
    if (i == n) return MurmurHash3.stringHash(s, seed)
    val cps = codePoints(s)
    var h = seed
    i = 0
    while (i + 1 < cps.length) {
      h = MurmurHash3.mix(h, (cps(i) << 16) + cps(i + 1))
      i += 2
    }
    if (i < cps.length) h = MurmurHash3.mixLast(h, cps(i))
    MurmurHash3.finalizeHash(h, cps.length)
  }
}
