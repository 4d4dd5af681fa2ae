package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe aggregation shapes. Plain sum/count skew is already absorbed by
  * Spark's partial aggregation; the shape that actually melts a reducer at
  * 100 TB is per-key DISTINCT over a hot key (the partial state is the
  * distinct set itself). The fix: salt by a hash of the VALUE, so one hot
  * key's distinct set is partitioned across `salts` reducers, each counts
  * its disjoint shard exactly, and the partials sum — identical result to a
  * direct count_distinct (value-hash partitioning ⇒ no double counting),
  * checked against the direct form by oracle (q50) and spec.
  */
object SkewSafe {

  /** Exact per-key distinct-value count via two-stage value-salted
    * aggregation. */
  def saltedDistinctCount(
      df: DataFrame, keyCols: Seq[String], valueCol: String,
      salts: Int = 32): DataFrame = {
    val keyed = keyCols.map(col)
    df.groupBy(keyed :+ pmod(xxhash64(col(valueCol)), lit(salts.toLong))
        .as("__salt"): _*)
      .agg(count_distinct(col(valueCol)).as("__partial"))
      .groupBy(keyed: _*)
      .agg(sum(col("__partial")).as("n_distinct"))
  }
}
