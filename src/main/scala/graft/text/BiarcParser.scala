package graft.text

import graft.{Sentence, Token}

/** Parser for Google Syntactic N-Grams "biarcs" lines (FIXTURES.md §A1),
  * with the exact tolerance semantics of the reference
  * (`DirtDriver.java:487-552`):
  *
  *   - a line is `head_word \t annotated_ngram \t total_count [\t ...]`;
  *     lines with fewer than 3 tab fields are dropped (`:491`);
  *   - `total_count` falls back to 1 when unparseable (`:496-500`);
  *   - tokens are `word/POS/dep/headIndex` parsed right-to-left with three
  *     `lastIndexOf('/')` so the word itself may contain slashes
  *     (`:532-545`); tokens with fewer than three slashes or a non-integer
  *     head are silently skipped (`:533-549`);
  *   - `head` is 1-based (0 = root).
  */
object BiarcParser {

  /** Parse one token of form `word/POS/dep/head`; None on malformed input. */
  def parseToken(s: String): Option[Token] = {
    val last = s.lastIndexOf('/')
    if (last == -1) return None
    val second = s.lastIndexOf('/', last - 1)
    if (second == -1) return None
    val third = s.lastIndexOf('/', second - 1)
    if (third == -1) return None
    try {
      val head = s.substring(last + 1).toInt
      val dep = s.substring(second + 1, last)
      val pos = s.substring(third + 1, second)
      val word = s.substring(0, third)
      Some(Token(word, pos, dep, head))
    } catch { case _: Exception => None }
  }

  /** Parse the space-separated annotated n-gram into tokens, skipping
    * malformed ones (reference `parse`, `:527-552`).
    */
  def parseTokens(ngram: String): Array[Token] = {
    val st = new java.util.StringTokenizer(ngram, " ")
    val out = Array.newBuilder[Token]
    while (st.hasMoreTokens) parseToken(st.nextToken()).foreach(out += _)
    out.result()
  }

  /** Parse a whole corpus line into a weighted sentence; None when the line
    * has < 3 fields or yields no tokens (`:491,503`).
    */
  def parseLine(line: String): Option[Sentence] = {
    val parts = line.split("\t")
    if (parts.length < 3) return None
    val cnt =
      try parts(2).toLong
      catch { case _: NumberFormatException => 1L }
    val tokens = parseTokens(parts(1))
    if (tokens.isEmpty) None else Some(Sentence(tokens, cnt))
  }
}
