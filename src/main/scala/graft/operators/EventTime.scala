package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Event-time micros extraction shared by the temporal operators.
  *
  * TIMESTAMP reads its epoch micros directly; TIMESTAMP_NTZ (what Spark 4
  * infers for the pandas/pyarrow parquet default) has no `unix_micros` and
  * is reinterpreted through a cast first. The temporal operators consume
  * only DIFFERENCES of these micros, so the session-TZ offset the cast
  * applies cancels — gap and window arithmetic is wall-clock-exact under
  * any fixed-offset session TZ (graft pins UTC; in a non-UTC session, only
  * events straddling a DST transition could shift by the DST delta).
  */
private[graft] object EventTime {
  /** `tsCol` as an int64-micros column, tolerant of TIMESTAMP_NTZ input. */
  def micros(df: DataFrame, tsCol: String): Column =
    df.schema(tsCol).dataType match {
      case TimestampNTZType => unix_micros(col(tsCol).cast(TimestampType))
      case _ => unix_micros(col(tsCol))
    }
}
