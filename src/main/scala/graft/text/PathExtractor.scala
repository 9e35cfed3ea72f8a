package graft.text

import graft.{PathInstance, Sentence, Token}

import scala.collection.mutable

/** Dependency-path extraction between noun pairs — the DIRT "extract" kernel
  * (reference `DirtDriver.java:373-477`). Pure per-sentence computation:
  * trees are at most n-gram sized, so the BFS runs inside one row of a typed
  * `flatMap` — no distributed graph machinery (SURVEY.md §1.1).
  *
  * Semantics reproduced exactly:
  *   - candidate pairs are all (i, j), i < j, over noun tokens in sentence
  *     order (`:383-391`);
  *   - the tree is made undirected via 1-based parent pointers; edges are
  *     appended in token order so BFS tie-breaks identically (`:439-447`);
  *   - a path is valid iff it contains a non-auxiliary verb (`:404-411`);
  *   - rendering (`:413-435`): endpoints `N`; internal nodes `V:<stem>`,
  *     `P:<lower>`, else `W:<lower>`; edge label `<dep` when the step goes
  *     toward the head, `>dep(next)` otherwise; all joined with `:`;
  *   - endpoint slot fillers are Porter-stemmed, not lowercased (`:395-396`).
  */
object PathExtractor {

  /** The 23 auxiliary verb forms whose presence alone does not validate a
    * path (`DirtDriver.java:375-378`).
    */
  val Aux: Set[String] = Set(
    "be", "am", "is", "are", "was", "were", "been", "being",
    "do", "does", "did", "have", "has", "had", "will", "would",
    "shall", "should", "can", "could", "may", "might", "must")

  def extract(sentence: Sentence): Seq[PathInstance] =
    extractPaths(sentence.tokens).map { case (p, x, y) =>
      PathInstance(p, x, y, sentence.cnt)
    }

  /** All (path, stemmedX, stemmedY) for noun pairs of one sentence. */
  def extractPaths(tokens: Array[Token]): Seq[(String, String, String)] = {
    val nouns = tokens.indices.filter(i => tokens(i).isNoun)
    val results = Seq.newBuilder[(String, String, String)]
    var i = 0
    while (i < nouns.length) {
      var j = i + 1
      while (j < nouns.length) {
        val src = nouns(i)
        val dst = nouns(j)
        shortestPath(tokens, src, dst) match {
          case Some(path) if isValid(tokens, path) =>
            results += ((buildPath(tokens, path),
              Porter.stem(tokens(src).word), Porter.stem(tokens(dst).word)))
          case _ => ()
        }
        j += 1
      }
      i += 1
    }
    results.result()
  }

  /** Valid iff some token on the path is a verb outside the AUX set. */
  def isValid(tokens: Array[Token], path: Seq[Int]): Boolean =
    path.exists { idx =>
      val t = tokens(idx)
      t.isVerb && !Aux.contains(t.word.toLowerCase)
    }

  /** Render the node/edge-label string grammar of `buildPath` (`:413-435`). */
  def buildPath(tokens: Array[Token], path: Seq[Int]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < path.length) {
      val curr = path(i)
      val t = tokens(curr)
      if (i == 0 || i == path.length - 1) sb.append("N")
      else if (t.isVerb) sb.append("V:").append(Porter.stem(t.word))
      else if (t.isPrep) sb.append("P:").append(t.word.toLowerCase)
      else sb.append("W:").append(t.word.toLowerCase)
      if (i < path.length - 1) {
        val next = path(i + 1)
        val rel =
          if (t.head - 1 == next) "<" + t.dep
          else ">" + tokens(next).dep
        sb.append(":").append(rel).append(":")
      }
      i += 1
    }
    sb.toString
  }

  /** Unweighted BFS shortest path src -> dst over the undirected tree;
    * adjacency built in token order for identical tie-breaking (`:437-476`).
    */
  def shortestPath(tokens: Array[Token], src: Int, dst: Int): Option[Seq[Int]] = {
    val n = tokens.length
    val adj = Array.fill(n)(mutable.ArrayBuffer.empty[Int])
    var i = 0
    while (i < n) {
      val h = tokens(i).head - 1
      if (h >= 0 && h < n) {
        adj(i) += h
        adj(h) += i
      }
      i += 1
    }
    val prev = Array.fill(n)(-1)
    val q = mutable.Queue(src)
    prev(src) = src
    var found = false
    while (q.nonEmpty && !found) {
      val u = q.dequeue()
      if (u == dst) found = true
      else adj(u).foreach { v =>
        if (prev(v) == -1) { prev(v) = u; q.enqueue(v) }
      }
    }
    if (prev(dst) == -1) None
    else {
      val path = mutable.ArrayBuffer.empty[Int]
      var curr = dst
      while (curr != src) { path += curr; curr = prev(curr) }
      path += src
      Some(path.reverse.toSeq)
    }
  }
}
