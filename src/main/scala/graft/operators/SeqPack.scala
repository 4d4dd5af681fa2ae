package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SEQUENCE PACKING for training-batch preparation: assign each document a
  * bin id such that bins hold ~`budget` of cost (tokens/chars) in stable
  * `orderCol` order — the pretraining packing step that turns a corpus into
  * fixed-budget context windows.
  *
  * The naive formulation is a GLOBAL running sum — `SUM(cost) OVER (ORDER
  * BY ord)` — which Spark executes as a SINGLE-partition window: the whole
  * 100 TB corpus through one task. This implementation is the distributed
  * two-phase prefix sum instead:
  *
  *  1. range-repartition by `orderCol` (deterministic boundaries) and
  *     cumsum WITHIN each partition — parallel windows;
  *  2. per-partition totals (O(partitions) rows) collect to the driver,
  *     turn into exclusive prefix OFFSETS, and broadcast-join back;
  *  3. global running sum = partition offset + local cumsum; bin =
  *     floor(exclusive-prefix / budget).
  *
  * Equivalent to the single-window form row for row (the oracle replays
  * that form), at shuffle cost of one range exchange.
  */
object SeqPack {

  def packBins(df: DataFrame, orderCol: String, costCol: String,
      budget: Long, partitions: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    val n =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // persist is LOAD-BEARING, not an optimization: RangePartitioner's
    // sampling seed derives from the RDD id, so two separate actions over
    // an unpersisted plan could draw DIFFERENT range boundaries — the
    // offsets pass and the main pass must see the same partitioning.
    val ranged = df.repartitionByRange(n, col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // null costs would silently skew the packing (the window sum skips
      // them while an oracle's arithmetic may not — and an all-null
      // partition makes sum() NULL, NPE-ing the offsets pass): reject them
      // loudly in the same cheap totals aggregation
      val totalRows = ranged.groupBy("__pid")
        .agg(sum(col(costCol).cast("long")).as("__psum"),
          count(when(col(costCol).isNull, 1)).as("__nulls"))
        .collect()
      val nullCost = totalRows.map(_.getLong(2)).sum
      require(nullCost == 0,
        s"packBins: $nullCost rows have null $costCol — null costs would " +
          "silently skew bin budgets; filter or coalesce them upstream")
      val totals = totalRows
        .map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
        .toMap
      // exclusive prefix offsets, in partition order (range partitions are
      // ordered by construction)
      val offsets = (0 until n).scanLeft(0L) {
        (acc, pid) => acc + totals.getOrElse(pid, 0L)
      }
      val offsetDf = spark.createDataFrame(
        (0 until n).map(pid => (pid, offsets(pid))))
        .toDF("__pid", "__off")
      val w = Window.partitionBy("__pid").orderBy(orderCol)
        .rowsBetween(Window.unboundedPreceding, -1)
      val out = ranged.join(F.broadcast(offsetDf), "__pid")
        .withColumn("__prev",
          coalesce(sum(col(costCol).cast("long")).over(w), lit(0L)) +
            col("__off"))
        .withColumn("bin",
          floor(col("__prev") / lit(budget.toDouble)).cast("long"))
        .drop("__pid", "__off", "__prev")
      // materialize eagerly (severing lineage from the cached copy), so
      // the intermediate cache can be released HERE instead of leaking for
      // the session's lifetime; the result itself is ContextCleaner-managed
      out.localCheckpoint(true)
    } finally ranged.unpersist()
  }
}
