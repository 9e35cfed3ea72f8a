package graft

/** Core data model for the DIRT pipeline (SURVEY.md §1.1).
  *
  * A corpus sentence is a tiny dependency tree: an array of tokens with
  * 1-based parent pointers (`head`, 0 = root) — reference semantics at
  * `DirtDriver.java:26-48`. Trees fit in one row; all graph work is
  * per-row inside a typed `flatMap`, never a distributed graph.
  */
final case class Token(word: String, pos: String, dep: String, head: Int) {
  def isNoun: Boolean = pos != null && pos.startsWith("N")
  def isVerb: Boolean = pos != null && pos.startsWith("V")
  def isPrep: Boolean = pos == "IN" || pos == "TO"
}

/** One corpus line after parsing: tokens + corpus frequency (weight). */
final case class Sentence(tokens: Array[Token], cnt: Long)

/** One (path, slot, word) observation with its weight — the engine's base
  * fact table; margins and N are aggregations over this (no MultipleOutputs
  * demux, cf. `DirtDriver.java:511-517`).
  */
final case class Triple(path: String, slot: String, word: String, cnt: Long)

/** A path instance: path string plus the two (stemmed) slot fillers. */
final case class PathInstance(path: String, x: String, y: String, cnt: Long)

/** Mutual-information feature: MI(path, slot, word) (`DirtDriver.java:694-700`). */
final case class MiFeature(path: String, slot: String, word: String, mi: Double)

/** Scored path pair, canonicalized path1 <= path2 (`DirtDriver.java:861-863`). */
final case class ScoredPair(path1: String, path2: String, score: Double)
