package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval sweep-line: the daily concurrency profile (peak number of
  * simultaneously-open intervals per calendar day, plus the count still
  * open at day end) — "how many sessions were live at once", the classic
  * capacity/occupancy analytic.
  *
  * The textbook form is ONE global running sum over every +1/-1 boundary
  * event — a single total order, i.e. a one-partition sort at 100 TB. This
  * implementation decomposes it into the scalable two-level prefix sum
  * (same shape as SeqPack's packing offsets):
  *   1. boundary deltas (+1 at start, -1 at end, ends after starts on a
  *      timestamp tie → closed-interval overlap semantics);
  *   2. a PER-DAY windowed running sum (hash-partitioned by day — wide);
  *   3. a day-level carry-in: cumulative sum of per-day delta totals over
  *      the tiny O(span-days) day table (the only single-partition window,
  *      bounded by `maxSpanDays`, never by data volume);
  *   4. day peak = max(carry_in, carry_in + within-day running max), with
  *      the day spine gap-filled via `sequence`+`explode` so days fully
  *      inside a long interval still report their carried concurrency.
  *
  * Beyond-reference training-pipeline operator (SURVEY.md §2.6 fence).
  */
object SweepLine {

  /** (day, peak, open_end): peak concurrent intervals during `day` and the
    * number still open at day end, for EVERY day in the global
    * [min(start-day), max(end-day)] span. Intervals are closed on both
    * bounds.
    */
  def dailyConcurrency(
      intervals: DataFrame, startCol: String, endCol: String,
      maxSpanDays: Int = 3660): DataFrame = {
    val deltas = intervals.select(col(startCol).as("t"), lit(1L).as("delta"))
      .unionAll(
        intervals.select(col(endCol).as("t"), lit(-1L).as("delta")))
      .withColumn("day", to_date(col("t")))

    // Wide pass: running sum within each day (+1 before -1 on ties).
    val wDay = Window.partitionBy("day")
      .orderBy(col("t"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perDay = deltas.withColumn("_run", sum(col("delta")).over(wDay))
      .groupBy(col("day"))
      .agg(sum(col("delta")).as("_tot"), max(col("_run")).as("_peakLocal"))

    // Narrow pass: global day spine + cumulative carry over O(days) rows.
    val bounds = perDay.agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
      .withColumn("_span", datediff(col("_d1"), col("_d0")))
      .withColumn("_d0",
        when(col("_span") <= maxSpanDays, col("_d0"))
          .otherwise(raise_error(
            lit(s"sweep-line day span exceeds $maxSpanDays days"))))
    val spine = bounds.select(
      explode(sequence(col("_d0"), col("_d1"), expr("interval 1 day")))
        .as("day"))
    // Constant partition key: the carry window is intentionally a single
    // partition (bounded at maxSpanDays rows), spelled out so WindowExec
    // doesn't warn about an accidental global window.
    val wCarry = Window.partitionBy(lit(0)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    spine.join(perDay, Seq("day"), "left")
      .withColumn("_tot0", coalesce(col("_tot"), lit(0L)))
      .withColumn("_cin", coalesce(sum(col("_tot0")).over(wCarry), lit(0L)))
      .select(
        col("day"),
        greatest(
          col("_cin"),
          col("_cin") + coalesce(col("_peakLocal"), lit(0L))).as("peak"),
        (col("_cin") + col("_tot0")).as("open_end"))
  }
}
