package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling (the pre-ingest quality report every
  * pipeline runs before trusting a new feed): per column, row count, null
  * count, exact distinct count, and min/max — in ONE aggregate pass over
  * the table, unpivoted to a row per column.
  *
  * Scale shape: count/null-count/min/max are plain map-side-combinable
  * aggregates; the exact distinct counts make Spark plan a single Expand
  * (one duplicated row per profiled column) feeding a two-stage hash
  * aggregate — linear in rows × profiled columns, no joins, no windows.
  * When that multiplier hurts (hundreds of columns at 100 TB), swap the
  * exact `countDistinct` for the KMV sketch ([[graft.functions.KmvSketch]])
  * — same one-pass shape, O(k) state.
  *
  * min/max are cast to string AFTER aggregating in the native type (a
  * lexicographic min of stringified numbers would be wrong); profile
  * integer/string/date columns — float formatting is engine-specific.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: unknown columns $missing")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).cast("long").as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long")
          .as(s"__nn_$c"),
        countDistinct(col(c)).cast("long").as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', __n_$c, __nn_$c, __nd_$c, __min_$c, __max_$c")
      .mkString(", ")
    one.selectExpr(s"stack(${cols.size}, $stacked) AS " +
      "(column, n_rows, n_null, n_distinct, min_value, max_value)")
  }
}
