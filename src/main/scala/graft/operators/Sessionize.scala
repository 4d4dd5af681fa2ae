package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: per key, a new session starts when the gap to
  * the previous event exceeds `gapSeconds` (exact int64 microsecond
  * arithmetic — no double epoch rounding at the boundary).
  *
  * Plan shape: one hash shuffle on the key + per-key sort (lag + running
  * sum share the same window frame, so Catalyst plans a single WindowExec),
  * then the session rollup re-aggregates by (key, session_id). At 100 TB
  * this is the canonical two-pass form; the window pass dominates and is
  * partitioned by key only — skewed users are the one scale risk, same as
  * any per-key window (salt the rollup if a key exceeds a partition).
  *
  * Beyond-reference training-data-pipeline operator (SURVEY.md §2.6 fence):
  * session features are the unit of user-behavior corpora.
  */
object Sessionize {

  /** Input + `session_id` (1-based, per key, in (ts, tie) order). */
  def withSessionId(
      events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NTZ-tolerant micros (EventTime): gap math uses differences only, so
    // the session bounds below keep the input column's own type untouched
    val tsUs = EventTime.micros(events, tsCol)
    val prev = lag(tsUs, 1).over(order)
    val newSession = when(
      prev.isNull ||
        tsUs - prev > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    events.withColumn("session_id", sum(newSession).over(run))
  }

  /** Session-level rollup: bounds, event count, exact-decimal value total. */
  def sessions(
      events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      gapSeconds: Long, valueCol: Column): DataFrame =
    withSessionId(events, keyCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(valueCol.cast("decimal(28,10)")).cast("double")
          .as("total_value"))
}
