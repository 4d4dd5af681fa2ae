package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated test tables (see /root/repo/TESTDATA.md).
  *
  * Mirrors the reference's parquet-directory scans
  * (reference: src/iceberg/iceberg-initial-load.py:54-55 — plain
  * `spark.read.format("parquet").load(path)`), expressed Spark-first so
  * Catalyst gets predicate pushdown + column pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which Spark's parquet reader
    // rejects outright; read nanos as long and truncate to microseconds
    // (integer `div`, matching DuckDB's CAST(ts_ns AS TIMESTAMP) truncation).
    // Set once per session (it survives; avoid a conf write on every call).
    val k = "spark.sql.legacy.parquet.nanosAsLong"
    if (spark.conf.getOption(k).forall(_ != "true")) spark.conf.set(k, "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every test table as a temp view so `spark.sql` works over the
    * same names the DuckDB oracle uses. Memoized per (session, dir): the SQL-
    * surface queries each call this, and re-deriving 10 parquet schemas per
    * query is pure overhead in a bench/verify loop. */
  def registerAll(spark: SparkSession, sfDir: String): Unit = synchronized {
    // weak keys: a stopped session must neither be pinned in memory nor
    // (via identity-hash collision) suppress registration for its successor
    if (registered.get(spark) != sfDir) {
      names.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
      registered.put(spark, sfDir)
    }
  }
  private val registered =
    new java.util.WeakHashMap[SparkSession, String]()
}
