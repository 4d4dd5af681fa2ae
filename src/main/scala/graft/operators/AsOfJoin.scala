package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the payload of the latest
  * right row with the same key whose `(ts, tieCol)` is lexicographically
  * ≤ the left row's timestamp (inclusive on equal `ts`).
  *
  * Implemented the shuffle-friendly way: tag both sides, union by name, one
  * window pass per key carrying the right payload forward with
  * `last(_, ignoreNulls = true)`. That is a SINGLE hash shuffle on the key
  * plus a per-key sort — no range-join row explosion, no broadcast of either
  * side — so it scales to a 100 TB event log the same way a window dedup
  * does (hot-key skew being the only risk, as for any per-key window).
  *
  * Semantics, precisely: right rows sort before left rows at equal `ts`
  * (inclusive as-of), and among right rows with equal `ts` the one with the
  * greatest `tieCol` wins — deterministic for unique `tieCol`.
  *
  * The reference has no as-of operator (SURVEY.md §2.6 scope fence); this is
  * part of the beyond-reference training-data-pipeline surface (feature
  * attribution: "state at event time" joins).
  */
object AsOfJoin {

  /** @param payload right-side columns to carry, as (rightCol -> outputCol);
    *                 output columns are null where no right row precedes. */
  def backward(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, tieCol: String,
      payload: Seq[(String, String)]): DataFrame = {
    // The payload is carried as ONE struct per right row, not per-column:
    // independent last(_, ignoreNulls) per column would resurrect an older
    // row's value wherever the as-of row's field is genuinely null, and
    // could tear fields of different right rows into a pair that never
    // existed. The struct itself is never null on right rows (even if every
    // field is), so last(ignoreNulls) picks exactly the as-of row.
    val payStruct = org.apache.spark.sql.types.StructType(
      right.select(payload.map { case (in, out) =>
        col(in).as(out) }: _*).schema.fields)
    val l = left.withColumn("__tag", lit(1))
      .withColumn("__asof", lit(null).cast(payStruct))
    val r0 = right.select(
      (keyCols :+ tsCol :+ tieCol).map(col) :+
        struct(payload.map { case (in, out) => col(in).as(out) }: _*)
          .as("__asof"): _*)
    // left columns absent on the right side: null-pad via unionByName
    val u = l.unionByName(
      r0.withColumn("__tag", lit(0)), allowMissingColumns = true)
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = u.withColumn(
      "__asof", last(col("__asof"), ignoreNulls = true).over(w))
    payload.foldLeft(carried.filter(col("__tag") === 1)) {
      case (df, (_, out)) => df.withColumn(out, col("__asof").getField(out))
    }.drop("__tag", "__asof")
  }
}
