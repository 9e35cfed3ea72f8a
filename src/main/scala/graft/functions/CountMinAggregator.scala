package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import scala.util.hashing.MurmurHash3

/** Count–Min sketch (Cormode & Muthukrishnan 2005): a `depth × width`
  * counter matrix; item x increments one counter per row (row i uses
  * seed i), and the point estimate is the MINIMUM across rows — which
  * can only OVERestimate (collisions add, never subtract): for any
  * item, `estimate ≥ true count`, and `estimate ≤ true count + εn`
  * with probability 1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.
  *
  * The dual of [[MisraGriesAggregator]]: MG never overestimates and
  * keeps only k−1 candidates; CM never underestimates and answers for
  * ANY item. Unlike MG, the merge is element-wise addition —
  * commutative and associative — so the sketch CONTENT (not just its
  * guarantees) is identical under any partitioning or merge order:
  * estimates are fully deterministic, which makes them usable in
  * oracled outputs. The fixed-size Long matrix (depth·width · 8 B)
  * shuffles per partition regardless of stream size.
  */
case class CountMinAggregator(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(depth > 0 && width > 0, s"bad dims $depth x $width")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], in: String): Array[Long] = {
    var d = 0
    while (d < depth) {
      buf(d * width + CountMinAggregator.bucket(in, d, width)) += 1
      d += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] = bufferEncoder
}

object CountMinAggregator {

  /** Row d's bucket for an item: code-point murmur3 with seed d, mod
    * width ([[graft.text.SqlText.murmurCp]] — BMP-identical to
    * `MurmurHash3.stringHash`, astral-identical to the SQL replay).
    */
  def bucket(item: String, d: Int, width: Int): Int = {
    val h = graft.text.SqlText.murmurCp(item, d) % width
    if (h < 0) h + width else h
  }

  /** Point estimate: the minimum counter across rows. */
  def estimate(sketch: Array[Long], depth: Int, width: Int,
      item: String): Long = {
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = sketch(d * width + bucket(item, d, width))
      if (c < best) best = c
      d += 1
    }
    best
  }
}
