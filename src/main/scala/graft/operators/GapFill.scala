package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Calendar gap-fill (date-spine resample): per key, the daily activity
  * series over the key's own [min(day), max(day)] range with missing days
  * zero-filled — the standard "regularize an event log into a time series"
  * step before trend features, burn-down charts, or training-window
  * construction.
  *
  * Plan shape (all distributed, no driver-side spine):
  *   1. one map-side-combinable hash aggregate keyed (key, day);
  *   2. per-key bounds as a re-aggregate of that daily table (tiny);
  *   3. the spine generated per key with `sequence(d0, d1, 1 day)` +
  *      `explode` — each key's calendar materializes on the executor that
  *      owns the key, never on the driver;
  *   4. a left hash join spine↔daily on (key, day).
  * At 100 TB the daily aggregate dominates and is a single shuffle; the
  * spine is O(keys × active-span-days), orders of magnitude smaller than
  * the event log, and AQE is free to broadcast whichever join side shrinks
  * below the threshold. A key whose span is pathological (centuries) would
  * blow up its row — `maxSpanDays` fails loud instead of silently exploding.
  *
  * Beyond-reference training-pipeline operator (SURVEY.md §2.6 fence).
  */
object GapFill {

  /** (key, day, n_events, total_value) for every day in each key's active
    * span; days with no events carry (0, 0.0). `total_value` is summed as
    * DECIMAL(28,10) then surfaced as DOUBLE (oracle-stable).
    */
  def dailyResample(
      events: DataFrame, keyCol: String, tsCol: String, valueCol: Column,
      maxSpanDays: Int = 3660): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(valueCol.cast("decimal(28,10)")).as("_v"))
    val bounds = daily.groupBy(col(keyCol))
      .agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
    // Loud guard: a corrupt timestamp (epoch 0, year 9999) would otherwise
    // explode one key into millions of spine rows.
    val guarded = bounds.withColumn("_span", datediff(col("_d1"), col("_d0")))
      .withColumn("_d0",
        when(col("_span") <= maxSpanDays, col("_d0"))
          .otherwise(raise_error(concat(
            lit(s"gap-fill span exceeds $maxSpanDays days for key "),
            col(keyCol).cast("string")))))
    val spine = guarded.select(
      col(keyCol),
      explode(sequence(col("_d0"), col("_d1"), expr("interval 1 day")))
        .as("day"))
    spine.join(daily, Seq(keyCol, "day"), "left")
      .select(
        col(keyCol), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("_v"), lit(0).cast("decimal(28,10)")).cast("double")
          .as("total_value"))
  }

  /** [[dailyResample]] with LINEAR INTERPOLATION instead of zero-fill:
    * each missing day's value is interpolated between the nearest
    * observed days (`IGNORE NULLS` window carry both directions). The
    * spine spans [first, last] OBSERVED day per key, so every gap day has
    * both neighbors by construction — no edge extrapolation case. Adds
    * two window passes over the (key, day) spine (same key partitioning
    * as the join — one shuffle total); `value_interp` is Parity-rounded
    * (the lerp divide is IEEE-identical cross-engine, rounding guards the
    * hash compare). */
  def dailyInterpolate(
      events: DataFrame, keyCol: String, tsCol: String, valueCol: Column,
      maxSpanDays: Int = 3660): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val filled = dailyResample(events, keyCol, tsCol, valueCol, maxSpanDays)
    val obsVal = when(col("n_events") > 0, col("total_value"))
    val obsDay = when(col("n_events") > 0, col("day"))
    val wPrev = Window.partitionBy(keyCol).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(keyCol).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    filled
      .withColumn("_pv", last(obsVal, ignoreNulls = true).over(wPrev))
      .withColumn("_pd", last(obsDay, ignoreNulls = true).over(wPrev))
      .withColumn("_nv", first(obsVal, ignoreNulls = true).over(wNext))
      .withColumn("_nd", first(obsDay, ignoreNulls = true).over(wNext))
      .select(col(keyCol), col("day"), col("n_events"),
        graft.core.Parity.round4(
          when(col("n_events") > 0, col("total_value"))
            .otherwise(col("_pv") +
              (col("_nv") - col("_pv")) *
                datediff(col("day"), col("_pd")).cast("double") /
                datediff(col("_nd"), col("_pd")).cast("double")))
          .as("value_interp"))
  }
}
