package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Multi-keyword corpus tagging via Aho–Corasick: count every
  * occurrence of every dictionary keyword in every document in ONE pass
  * over the text, independent of dictionary size — the FlashText shape
  * a curation pipeline uses for topic tagging, blocklist auditing, and
  * licensing-string detection, where running |dict| separate
  * regex/contains passes over 100 TB is the naive O(|dict|·corpus)
  * mistake this operator exists to avoid.
  *
  * Spark shape: the automaton is built ONCE from the (bounded, by
  * contract in-memory) dictionary, broadcast, and applied in a single
  * `mapPartitions` — map-only, no shuffle, no per-keyword scans. The
  * automaton is plain arrays (goto map, fail links, per-node output
  * lists), so the broadcast is compact and the scan does O(1) amortized
  * work per character.
  *
  * Matching semantics: every end position of every keyword is counted —
  * i.e. overlapping occurrences count separately ("aaa" contains "aa"
  * twice). q141's SQL oracle probes every (keyword, start position)
  * pair, so it counts exactly these semantics for ANY dictionary,
  * borderful keywords included; for border-free keywords the count
  * additionally coincides with the non-overlapping greedy
  * (replace()-based) count, a property KeywordTagSpec pins.
  */
object KeywordTag {

  /** Immutable flattened automaton: trie with breadth-first fail links
    * (Aho–Corasick 1975), children as per-node sorted parallel arrays
    * for allocation-free binary search during the scan.
    */
  final class Automaton private (
      val childChars: Array[Array[Char]],
      val childNodes: Array[Array[Int]],
      val fail: Array[Int],
      val out: Array[Array[Int]],
      val keywords: Array[String]) extends Serializable {

    private def step(from: Int, c: Char): Int = {
      var s = from
      while (true) {
        val i = java.util.Arrays.binarySearch(childChars(s), c)
        if (i >= 0) return childNodes(s)(i)
        if (s == 0) return 0
        s = fail(s)
      }
      0 // unreachable
    }

    /** Occurrence count per keyword index over `text` (lowercased by
      * the caller to match the dictionary's case contract). */
    def countMatches(text: String): Array[Long] = {
      val counts = new Array[Long](keywords.length)
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        val hits = out(s)
        var j = 0
        while (j < hits.length) { counts(hits(j)) += 1; j += 1 }
        i += 1
      }
      counts
    }
  }

  object Automaton {
    def build(keywords: Seq[String]): Automaton = {
      require(keywords.nonEmpty, "empty keyword dictionary")
      require(keywords.forall(_.nonEmpty), "empty-string keyword")
      require(keywords.distinct.size == keywords.size,
        "duplicate keywords")
      val kws = keywords.toArray
      // mutable trie
      val children = mutable.ArrayBuffer(mutable.TreeMap.empty[Char, Int])
      val outputs = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
      kws.zipWithIndex.foreach { case (kw, ki) =>
        var s = 0
        kw.foreach { c =>
          s = children(s).getOrElse(c, {
            children += mutable.TreeMap.empty[Char, Int]
            outputs += mutable.ArrayBuffer.empty[Int]
            val n = children.size - 1
            children(s)(c) = n
            n
          })
        }
        outputs(s) += ki
      }
      // breadth-first fail links; each node's outputs absorb its fail
      // target's (already-final, BFS order) outputs
      val n = children.size
      val fail = new Array[Int](n)
      val queue = mutable.Queue.empty[Int]
      children(0).values.foreach(queue += _) // depth-1 fails to root
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        children(u).foreach { case (c, v) =>
          var f = fail(u)
          while (f != 0 && !children(f).contains(c)) f = fail(f)
          fail(v) = children(f).get(c).filter(_ != v).getOrElse(0)
          outputs(v) ++= outputs(fail(v))
          queue += v
        }
      }
      new Automaton(
        children.map(_.keys.toArray).toArray,
        children.map(_.values.toArray).toArray,
        fail,
        outputs.map(_.toArray).toArray,
        kws)
    }
  }

  /** (doc_id, keyword, n_matches) for every keyword occurring at least
    * once in the doc's lowercased text — one automaton pass per doc.
    */
  def tag(docs: DataFrame, keywords: Seq[String],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // distinct AFTER case-folding: "Art" and "art" are one dictionary
    // entry under the lowercased-match contract, not a build-time crash
    val ac = spark.sparkContext.broadcast(
      Automaton.build(
        keywords.map(_.toLowerCase(java.util.Locale.ROOT)).distinct))
    docs
      .select(col(idCol).cast("long"), lower(col(textCol)))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val a = ac.value
        rows.flatMap { case (id, text) =>
          if (text == null) Iterator.empty
          else {
            val counts = a.countMatches(text)
            counts.indices.iterator
              .filter(counts(_) > 0)
              .map(ki => (id, a.keywords(ki), counts(ki)))
          }
        }
      }
      .toDF("doc_id", "keyword", "n_matches")
  }
}
