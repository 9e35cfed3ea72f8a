package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.8): an exact bounded top-k sketch as an
  * `Aggregator[IN, BUF, OUT]` — usable in `groupByKey(...).agg(...)` where
  * a window would shuffle the whole group through one task. The buffer
  * never exceeds k entries, so partial aggregation bounds both memory and
  * shuffle bytes per group at k, independent of group size: the UDAF twin
  * of `VectorSearch.topKPerQuery`.
  *
  * Ranking order: higher score first, lower id breaks ties (a total
  * order, so merges are associative and deterministic).
  */
case class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {
  require(k > 0, s"k must be positive, got $k")

  private def better(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def prune(xs: Seq[(Long, Double)]): Seq[(Long, Double)] =
    xs.sortWith(better).take(k)

  /** O(k) ordered insert into a best-first buffer (the per-row hot path —
    * no full re-sort per accepted element).
    */
  private def insert(buf: Seq[(Long, Double)],
      in: (Long, Double)): Seq[(Long, Double)] = {
    val i = buf.indexWhere(x => better(in, x))
    val at = if (i < 0) buf.size else i
    buf.patch(at, Seq(in), 0)
  }

  override def zero: Seq[(Long, Double)] = Vector.empty

  override def reduce(buf: Seq[(Long, Double)],
      in: (Long, Double)): Seq[(Long, Double)] =
    if (buf.size < k) insert(buf, in)
    else if (better(in, buf.last)) insert(buf, in).take(k)
    else buf

  override def merge(a: Seq[(Long, Double)],
      b: Seq[(Long, Double)]): Seq[(Long, Double)] = prune(a ++ b)

  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = buf

  // ExpressionEncoder derivation keeps the buffer in Tungsten rows
  // (array<struct<long,double>>), not opaque kryo blobs
  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] = bufferEncoder
}
