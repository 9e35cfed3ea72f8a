package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded smallest-k sketch: the ascending twin of [[TopKAggregator]],
  * keeping the k smallest (key, id) pairs in lexicographic order. Used by
  * quota selection (`Curation.sourceCap`) where a `row_number` window
  * would shuffle every row of a hot group through a single task — the
  * buffer never exceeds k entries, so map-side partial aggregation bounds
  * shuffle bytes per group at k regardless of group size.
  *
  * (key, id) lexicographic ascending is a total order when ids are
  * unique, so merges are associative and the result deterministic.
  */
case class MinKAggregator(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  private def less(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  private def prune(xs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    xs.sortWith(less).take(k)

  /** O(k) ordered insert into a smallest-first buffer. */
  private def insert(buf: Seq[(Long, Long)],
      in: (Long, Long)): Seq[(Long, Long)] = {
    val i = buf.indexWhere(x => less(in, x))
    val at = if (i < 0) buf.size else i
    buf.patch(at, Seq(in), 0)
  }

  override def zero: Seq[(Long, Long)] = Vector.empty

  override def reduce(buf: Seq[(Long, Long)],
      in: (Long, Long)): Seq[(Long, Long)] =
    if (buf.size < k) insert(buf, in)
    else if (less(in, buf.last)) insert(buf, in).take(k)
    else buf

  override def merge(a: Seq[(Long, Long)],
      b: Seq[(Long, Long)]): Seq[(Long, Long)] = prune(a ++ b)

  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] = bufferEncoder
}
