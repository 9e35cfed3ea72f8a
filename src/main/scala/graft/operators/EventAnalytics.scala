package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics: ordered funnels and retention cohorts —
  * the two queries every product-event pipeline runs, shaped for scale:
  *
  *   - [[funnel]] is a chain of per-step `groupBy(user).min(ts)`
  *     aggregations and equi-joins on user id (each step's state is one
  *     row per surviving user, monotonically shrinking); no windows, no
  *     per-user event sorting, so a power user with millions of events
  *     costs one partial-aggregated min, not a single-task sort;
  *   - [[retention]] reduces the event log to distinct (user, week)
  *     activity — the partial-aggregated distinct bounds the shuffle at
  *     users × weeks — then one equi-join against each user's cohort
  *     week.
  *
  * Both emit only integers/dates, hash-exact against any SQL engine.
  */
object EventAnalytics {

  /** Ordered-funnel completion counts: a user completes step i when an
    * event of `steps(i)` occurs STRICTLY after their earliest
    * completion of step i-1 (first-touch attribution, the standard
    * product-funnel semantics). Output: one row per step —
    * `(step, step_name, n_users)`, step 1-based.
    */
  def funnel(events: DataFrame, steps: Seq[String],
      tsCol: String = "ts", userCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val perStep = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val hits = events.filter(col(typeCol) === step)
        val reached = prev match {
          case None => hits
          case Some(p) =>
            hits.join(p.select(col(userCol), col("__t").as("__prev_t")),
              Seq(userCol))
              .filter(col(tsCol) > col("__prev_t"))
        }
        Some(reached.groupBy(col(userCol)).agg(min(col(tsCol)).as("__t")))
    }.flatten
    perStep.zip(steps).zipWithIndex
      .map { case ((df, name), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step"), lit(name).as("step_name"),
            col("n_users"))
      }
      .reduce(_.unionByName(_))
      .orderBy("step")
  }

  /** Per-event session ids (gaps-and-islands): a new session starts
    * when the gap since the user's previous event exceeds
    * `gapMinutes`. One window per user ordered by (ts, event id — the
    * unique tiebreak keeps the running sum deterministic under equal
    * timestamps); the partition key is a USER, so the window's state is
    * bounded by one user's events — the acceptable window shape, unlike
    * a corpus-wide partition. Emits `session_id` = (user_id,
    * session_seq) so downstream grouping needs no re-derivation.
    * The aggregated twin of this (per-session windows) is
    * [[graft.streaming.StreamOps.sessionCounts]]/q42; this one labels
    * the EVENTS, which attribution and funnel slicing need.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
      tsCol: String = "ts", userCol: String = "user_id",
      idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val newSession = when(
      lag(col(tsCol), 1).over(w).isNull ||
        col(tsCol).cast("long") - lag(col(tsCol), 1).over(w).cast("long")
          > gapMinutes * 60L, 1L).otherwise(0L)
    events.withColumn("session_seq",
      sum(newSession).over(
        Window.partitionBy(col(userCol))
          .orderBy(col(tsCol), col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Slowly-changing-dimension type 2 build: turn a per-key change
    * stream into validity intervals — each change row becomes a version
    * with `valid_from` = its own timestamp and `valid_to` = the key's
    * NEXT change (null on the open, current version). One `lead` window
    * per key ordered by (ts, unique id tiebreak): the partition key is
    * an entity, so window state is bounded by one entity's history —
    * the same acceptable window shape as [[sessionize]], never a
    * corpus-wide partition. Attribute columns pass through untouched;
    * the output is the standard point-in-time-joinable dimension table
    * ("state of key k at time t" = the row with valid_from ≤ t <
    * valid_to).
    */
  def scd2(changes: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Weekly retention matrix: cohort = the Monday-truncated week of a
    * user's first event; for every (cohort_week, week_offset) the
    * number of cohort users with any activity that week. Output:
    * `(cohort_week DATE, week_offset INT, n_users)`.
    */
  def retention(events: DataFrame, tsCol: String = "ts",
      userCol: String = "user_id"): DataFrame = {
    val weekly = events
      .select(col(userCol),
        date_trunc("week", col(tsCol)).cast("date").as("week"))
      .distinct()
    val cohorts = weekly.groupBy(col(userCol))
      .agg(min(col("week")).as("cohort_week"))
    weekly
      .join(cohorts, Seq(userCol))
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("int")
          .as("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }
}
