package graft.util

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import java.lang.ref.WeakReference
import java.util.concurrent.atomic.AtomicBoolean

/** Scoped release for persisted intermediates inside a lazily-returned
  * plan.
  *
  * Operators like the prefix-filtered Jaccard join persist intermediates
  * (token table, doc profiles) that several branches of ONE returned plan
  * consume. The operator cannot unpersist before returning — the caller
  * has not executed anything yet — and leaving the persists in place
  * leaks session-lifetime cached blocks per invocation (callers without
  * a `clearCache()` harness accumulate them).
  *
  * This registers a one-shot [[QueryExecutionListener]] that unpersists
  * the given datasets as soon as ANY action whose analyzed plan contains
  * the returned plan completes (success or failure), then unregisters
  * itself. Until then the caches serve every branch of that first
  * action; afterwards re-executing the same DataFrame recomputes from
  * source (correct, just uncached) — the documented contract for
  * operators that hand back a lazy result.
  *
  * If the caller never runs an action, nothing was ever materialized
  * (persist is lazy), so no cached DATA leaks — but the listener itself
  * would otherwise stay registered for the session's lifetime, paying a
  * full `sameResult` tree comparison on every subsequent query. The
  * target plan is therefore held only WEAKLY: once the caller drops the
  * un-actioned frame and it is collected, no future action can match
  * anyway, so the next query event unregisters the listener (and clears
  * the empty cache-manager entries).
  */
object CacheRelease {

  /** Returns `result` unchanged, with `cached` scheduled for unpersist
    * after the first completed action that consumes `result`'s plan.
    */
  def afterFirstAction(result: DataFrame, cached: Seq[Dataset[_]]): DataFrame = {
    val spark = result.sparkSession
    // weak: the caller's DataFrame keeps the analyzed plan alive; the
    // listener must not (see class doc — un-actioned frames would pin
    // the listener, and its per-query tree comparison, forever)
    val targetRef = new WeakReference(result.queryExecution.analyzed)
    val done = new AtomicBoolean(false)
    val listener: QueryExecutionListener = new QueryExecutionListener {
      private def release(): Unit =
        if (done.compareAndSet(false, true)) {
          cached.foreach(_.unpersist(blocking = false))
          spark.listenerManager.unregister(this)
        }
      private def maybeRelease(qe: QueryExecution): Unit = {
        targetRef.get match {
          case null => release() // frame collected: nobody can match now
          case target =>
            // listener-bus exceptions would poison unrelated listeners;
            // any failure here just means "keep the cache" (the
            // pre-listener behavior), never a crashed query
            val hit =
              try qe.analyzed.exists(_.sameResult(target))
              catch { case scala.util.control.NonFatal(_) => false }
            if (hit) release()
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = maybeRelease(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = maybeRelease(qe)
    }
    spark.listenerManager.register(listener)
    result
  }
}
