package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982; mergeable form
  * per Agarwal et al. 2013, "Mergeable Summaries"): at most `k - 1`
  * (item, counter) pairs, with the guarantees that after ANY sequence of
  * reduces and merges over n items,
  *
  *   - every item with true frequency > n/k is present in the summary;
  *   - each present item's counter underestimates its true frequency by
  *     at most n/k.
  *
  * reduce: increment a present item, insert if space, else decrement all
  * counters (dropping zeros) — the classic algorithm. merge: sum
  * counters item-wise, and if the union exceeds k-1 entries subtract the
  * k-th largest counter from every entry and drop the non-positives —
  * the Agarwal et al. merge that preserves both guarantees, making the
  * summary safe for map-side partial aggregation: a 100 TB token stream
  * shuffles at most k-1 counters per partition, never the stream.
  *
  * The summary CONTENT depends on merge order (only the guarantees are
  * order-free), so operators that need deterministic output re-derive it
  * from the guarantee — see `TextAnalysis.heavyHitters`, which uses the
  * summary as a candidate set and emits exact counts.
  */
case class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 1, s"k must be > 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], in: String): Map[String, Long] =
    buf.get(in) match {
      case Some(c) => buf.updated(in, c + 1)
      case None if buf.size < k - 1 => buf.updated(in, 1L)
      case None =>
        buf.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long],
      b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (w, c)) =>
      m.updated(w, m.getOrElse(w, 0L) + c)
    }
    if (sum.size <= k - 1) sum
    else {
      // subtract the k-th largest counter from all, keep positives —
      // removes ≥ (size - k + 1) entries, so the bound is restored
      val kth = sum.values.toSeq.sorted(Ordering[Long].reverse)(k - 1)
      sum.view.mapValues(_ - kth).filter(_._2 > 0).toMap
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] = bufferEncoder
}
