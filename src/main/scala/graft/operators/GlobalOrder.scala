package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic GLOBAL TRAINING ORDER — the "shuffle once, train
  * anywhere" step of a data pipeline: a seeded pseudo-random permutation of
  * the corpus materialized as an explicit 0-based `ord` column, so every
  * epoch / restart / engine reading the corpus sees the SAME order without
  * re-shuffling. The permutation key is `md5(seed || ':' || id)` —
  * cross-engine replayable (any SQL engine reproduces the order), and a new
  * seed is a brand-new permutation with no relation to the old one.
  *
  * Scale posture (100 TB): a naive `row_number() OVER (ORDER BY ...)` is a
  * SINGLE-PARTITION window — the whole corpus through one task. This is the
  * standard two-phase rank instead:
  *   1. a DETERMINISTIC bucket from the key's own prefix —
  *      `floor(hex4(key) · n / 65536)` — monotone in the key (bucket order
  *      IS key order) and uniform (md5), so no sampled range partitioner
  *      whose boundaries change run to run (Spark's RangePartitioner seeds
  *      its sample from the RDD id — two passes over the same plan would
  *      disagree);
  *   2. a per-BUCKET window rank (distributed — n buckets, each a
  *      partition-sized task) plus one tiny O(buckets) count pass whose
  *      cumulative offsets join back broadcast.
  * Total: one wide shuffle of the data + one O(buckets) driver list — no
  * operator ever holds more than a bucket, and every pass is a pure
  * function of (seed, id): reruns, engines, and epochs agree.
  */
object GlobalOrder {

  /** `df` plus a global 0-based `ord` column: the rank of the row in the
    * seeded permutation. `id` must be unique (it tie-breaks md5 collisions
    * exactly; a duplicated id would make the order of its copies
    * arbitrary-but-stable). */
  def rank(df: DataFrame, idCol: String, seed: String,
      numPartitions: Int = 0): DataFrame = {
    val key: Column =
      md5(concat(lit(seed), lit(":"), col(idCol).cast("string")))
    val n =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // bucket = the key's first 16 bits scaled to n — deterministic,
    // monotone in the key, uniform under md5
    val keyed = df.withColumn("__gk", key)
      .withColumn("__pid",
        (conv(substring(col("__gk"), 1, 4), 16, 10).cast("long") * n
          / 65536L).cast("int"))
    val local = org.apache.spark.sql.functions.row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("__pid")).orderBy(col("__gk"), col(idCol)))
    // O(buckets) driver pass → cumulative offsets, broadcast back
    val counts = keyed.groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (p, c)) =>
      (p, acc + c)
    }.tail.zip(counts).map { case ((p, end), (_, c)) => (p, end - c) }
    val offDf = df.sparkSession.createDataFrame(
      offsets.toSeq.map { case (p, o) => (p, o) })
      .toDF("__pid", "__off")
    keyed.withColumn("__local", local.cast("long") - 1L)
      .join(broadcast(offDf), "__pid")
      .withColumn("ord", col("__off") + col("__local"))
      .drop("__gk", "__pid", "__local", "__off")
  }
}
