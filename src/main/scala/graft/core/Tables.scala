package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

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
    val path = s"$sfDir/$name.parquet"
    val inferred = spark.read.parquet(path)
    // pandas/pyarrow write TIMESTAMP µs with isAdjustedToUTC=false by
    // default; Spark 4 infers that as TimestampNTZType, which watermarks,
    // session_window and sequence() all reject. Normalize to TIMESTAMP at
    // ingest (the reference does the same defensively via to_timestamp —
    // /root/reference/src/hudi/hudi-cdc-load.py:76 — and its Spark 3.3 has
    // no NTZ inference at all). Re-read with a TIMESTAMP read schema rather
    // than casting: the session TZ is UTC everywhere in graft so values are
    // preserved bit-for-bit (oracle agreement holds), and a read-schema
    // override keeps predicate pushdown on the timestamp columns — a cast
    // projection would strip PushedFilters from every time-range scan,
    // which is exactly the filter shape that matters at 100 TB.
    val df =
      if (inferred.schema.exists(_.dataType == TimestampNTZType))
        spark.read.schema(StructType(inferred.schema.fields.map(f =>
          if (f.dataType == TimestampNTZType) f.copy(dataType = TimestampType)
          else f))).parquet(path)
      else inferred
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
