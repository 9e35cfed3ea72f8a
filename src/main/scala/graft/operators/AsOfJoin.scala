package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.5 J7): for every left row, the payload of the
  * latest right row with `right.ts <= left.ts`, per key — the time-series
  * lookup DuckDB spells `ASOF JOIN`.
  *
  * Implemented as union + ordered last-value carry-forward: tag both
  * sides, sort within each key by (ts, side) so a right row at time t
  * precedes left rows at the same t, and carry the last right payload
  * forward with an unbounded-preceding window. The payload travels as one
  * struct so all carried columns come from the same right row. One
  * shuffle on the key, no range-join row explosion — the per-key window
  * is sequential, which is the standard trade for as-of at scale (keys
  * are many, history per key bounded).
  */
object AsOfJoin {

  /** @param keys         equi-join key columns (present on both sides)
    * @param leftTs       event-time column of the left (probe) side
    * @param rightTs      event-time column of the right (reference) side
    * @param rightPayload right columns to carry; emitted as `asof_<name>`,
    *                     null when no right row is at-or-before the probe
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__payload",
        lit(null).cast(right.select(rightPayload.map(col): _*).schema
          .foldLeft(new org.apache.spark.sql.types.StructType)(
            (st, f) => st.add(f))))

    val r = right
      .select((keys :+ rightTs) ++ rightPayload map col: _*)
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__payload", struct(rightPayload.map(col): _*))

    val lView = l.select(
      (leftCols ++ Seq("__ts", "__side", "__payload")).map(col): _*)
    val rView = leftCols.filterNot(keys.contains).foldLeft(r)(
      (df, c) => df.withColumn(c, lit(null)))
      .select((leftCols ++ Seq("__ts", "__side", "__payload")).map(col): _*)

    // __payload as the final sort key: when several right rows share
    // (key, ts), the carried payload is deterministically the struct-max
    // one, not whichever the shuffle happened to order last
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lView.unionByName(rView)
      .withColumn("__carried", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col("__carried").getField(c).as(s"asof_$c")): _*)
  }
}
