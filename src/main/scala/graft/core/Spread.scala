package graft.core

import org.apache.spark.sql.DataFrame

/** Upward-only repartitioning for compute-heavy per-row operators.
  *
  * Small fixture tables arrive as one parquet file = one partition, which
  * serializes CPU-bound work (hashing, signatures) onto a single core. At
  * production scale the input has many splits and this is a no-op — the
  * guard only ever INCREASES parallelism, never collapses a well-partitioned
  * input into fewer partitions (that would be a regression at 100 TB).
  */
object Spread {
  def up(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
