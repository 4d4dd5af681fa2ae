package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-event-per-key CDC deduplication — the algorithmic core of the
  * reference's CDC jobs (reference: src/hudi/hudi-cdc-load.py:79-91,
  * src/iceberg/iceberg-cdc-load.py:88-100, src/delta/delta-cdc-load.py:82-94):
  * per primary key keep only rows whose event time equals the key's max event
  * time, then route by `Op`.
  *
  * Faithful edge semantics: with no precombine key, max-timestamp TIES KEEP
  * ALL tied rows (the reference does not tie-break — SURVEY.md §2.2). With a
  * precombine column configured, ties break on the greatest precombine value
  * (what Hudi's precombine would do), deterministically.
  *
  * Plan shape: a single hash-shuffle on the key (WindowExec with a
  * partition-only frame — no global sort). At 100 TB the alternative
  * groupBy(key).agg(max) + semi-join costs two shuffles of the full batch;
  * the window form shuffles once, so it wins for wide CDC batches.
  */
object CdcDedup {

  /** Keep rows whose `tsCol` equals the per-key maximum (ties keep both). */
  def latestPerKey(df: DataFrame, keys: Seq[String], tsCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    df.withColumn("__max_ts", max(col(tsCol)).over(w))
      .filter(col(tsCol) === col("__max_ts"))
      .drop("__max_ts")
  }

  /** Tie-breaking variant: exactly one row per key, ordered by (tsCol desc,
    * precombine desc). Use when a precombine key is configured
    * (reference concept: cdk.json:61-86 `precombine_key`). */
  def latestPerKeyStrict(
      df: DataFrame, keys: Seq[String], tsCol: String,
      precombine: Seq[String]): DataFrame = {
    val ord = (col(tsCol).desc +: precombine.map(col(_).desc))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Single-pass per-Op metrics — replaces the reference's four separate
    * `count()` actions over uncached lineage
    * (reference: src/hudi/hudi-cdc-load.py:97-104). */
  def opCounts(df: DataFrame, opCol: String = "Op"): Map[String, Long] =
    df.groupBy(col(opCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
}
