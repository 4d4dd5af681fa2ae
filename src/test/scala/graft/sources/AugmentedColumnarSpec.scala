package graft.sources

import graft.SparkSpec
import graft.storage.{CowTable, TableConfig}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** DV- and generated-column-tolerant COLUMNAR reads
  * ([[GraftAugmentedColumnarReader]]): a deletion-vectored file or a
  * pre-evolution file needing the generated partition column no longer
  * degrades the whole scan to row mode — batches without deletions pass
  * through the vectorized reader untouched, batches with deletions are
  * compacted, and row positions stay exact under row-group skipping. */
class AugmentedColumnarSpec extends SparkSpec {
  import spark.implicits._

  private def isColumnar(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("ColumnarToRow")

  test("a DV'd file keeps the scan COLUMNAR with exact results") {
    val dir = tmpDir("augc")
    val t = CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      changeDataFeed = true, deletionVectors = true))
    // strings + nulls exercise every compaction copy path
    t.create((1L to 300L).map(i =>
        (i, if (i % 7 == 0) null else s"name-$i", i * 0.5))
      .toDF("id", "name", "v").repartition(3))
    t.delete(Seq(6L, 16L, 26L, 7L, 14L).toDF("id"))
    val df = spark.read.format("graft").load(dir + "/t")
    assert(isColumnar(df), // the r16 cliff: this used to force row mode
      s"DV'd scan must stay columnar:\n${df.queryExecution.executedPlan}")
    assert(df.count() == 295)
    val got = df.as[(Long, String, Double)].collect().toSet
    val want = (1L to 300L).filterNot(Set(6L, 16L, 26L, 7L, 14L))
      .map(i => (i, if (i % 7 == 0) null else s"name-$i", i * 0.5)).toSet
    assert(got == want)
    // pushed key-range scan on a vectored table stays exact AND columnar
    val f = df.filter(col("id") <= 10)
    assert(isColumnar(f))
    assert(f.select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L, 5L, 8L, 9L, 10L))
    // row mode agrees bit-for-bit (the opt-out stays exact)
    assert(spark.read.format("graft").option("columnar", "false")
      .load(dir + "/t").as[(Long, String, Double)].collect().toSet == want)
  }

  test("mixed-era partition evolution keeps the scan COLUMNAR; derived " +
      "values exact") {
    val dir = tmpDir("augc")
    val t0 = CowTable(spark, dir + "/e", TableConfig("e", Seq("id"),
      partitionSpec = Some("day(ts)")))
    def rows(r: (Long, String, Double)*) = r.toSeq.toDF("id", "ts_s", "v")
      .selectExpr("id", "CAST(ts_s AS TIMESTAMP) AS ts", "v")
    t0.create(rows(
      (1L, "2024-03-01 10:30:00", 1.0), (2L, "2024-03-02 23:10:00", 2.0)))
    val t1 = t0.alterPartitionSpec(Some("hour(ts)"))
    t1.upsert(rows((3L, "2024-03-03 07:45:00", 3.0)))
    val df = spark.read.format("graft").load(dir + "/e")
      .selectExpr("id", "ts_hour")
    assert(isColumnar(df), // pre-evolution files used to force row mode
      s"era-mixed scan must stay columnar:\n${df.queryExecution.executedPlan}")
    assert(df.as[(Long, String)].collect().toSet == Set(
      (1L, "2024-03-01-10"), (2L, "2024-03-02-23"), (3L, "2024-03-03-07")))
    // DV on the OLD-era file composes with the per-batch derivation
    val t2 = CowTable(spark, dir + "/e", TableConfig("e", Seq("id"),
      partitionSpec = Some("hour(ts)"), changeDataFeed = true,
      deletionVectors = true))
    t2.delete(Seq(1L).toDF("id"))
    val df2 = spark.read.format("graft").load(dir + "/e")
      .selectExpr("id", "ts_hour")
    assert(isColumnar(df2))
    assert(df2.as[(Long, String)].collect().toSet == Set(
      (2L, "2024-03-02-23"), (3L, "2024-03-03-07")))
  }

  // ---- direct-reader probes (gate lowered; positions are observable) ----

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("pad", StringType)))

  /** One multi-row-group file of ids 1..4000 in id order (row position =
    * id - 1) plus a DV sidecar dir marking `deletedIds`. */
  private def fixture(dir: String, deletedIds: Seq[Long]): (String, String) = {
    (1L to 4000L).map(i => (i, s"pad-$i-" + "x" * 64)).toDF("id", "pad")
      .orderBy("id").coalesce(1)
      .write.option("parquet.block.size", "8192")
      .option("parquet.page.size", "2048")
      .parquet(dir + "/data")
    val file = new java.io.File(dir + "/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    deletedIds.map(i => ("rel/data.parquet", i - 1))
      .toDF("path", "pos").coalesce(1).write.parquet(dir + "/dv")
    (file, dir + "/dv")
  }

  private def readIds(file: String, dvDir: Option[String],
      filters: Seq[Filter]): Seq[Long] = {
    val r = new GraftAugmentedColumnarReader(file, schema, Map.empty,
      capacity = 512, dv = dvDir.map(d => (d, "rel/data.parquet")),
      genFill = None, filters = filters, rowGroupFilterMinBytes = 0L)
    val out = Seq.newBuilder[Long]
    try {
      while (r.next()) {
        val b = r.get()
        var i = 0
        while (i < b.numRows()) { out += b.column(0).getLong(i); i += 1 }
      }
    } finally r.close()
    out.result()
  }

  test("direct reader: DV subtraction exact, batches without deletions " +
      "pass through, fully-deleted batches skipped") {
    val dir = tmpDir("augc") + "/d1"
    // a contiguous block longer than the 512-row batch capacity (whole
    // batches die) plus scattered singles
    val deleted = (1000L to 1700L) ++ Seq(1L, 4000L, 2500L)
    val (file, dv) = fixture(dir, deleted)
    val got = readIds(file, Some(dv), Nil)
    val want = (1L to 4000L).filterNot(deleted.toSet)
    assert(got == want, s"missing=${want.toSet -- got.toSet} " +
      s"extra=${got.toSet -- want.toSet}")
  }

  test("direct reader: positions stay exact under row-group skipping") {
    val dir = tmpDir("augc") + "/d2"
    val deleted = Seq(3901L, 3950L, 4000L, 10L)
    val (file, dv) = fixture(dir, deleted)
    // predicate selects the tail groups only; the deleted tail ids must
    // STILL subtract (drifted positions would delete the wrong rows)
    val got = readIds(file, Some(dv), Seq(GreaterThanOrEqual("id", 3900L)))
    assert(got.nonEmpty && got.size < 2000,
      s"row-group skipping did not engage: read ${got.size}/4000")
    val inRange = got.filter(_ >= 3900L)
    assert(inRange == (3900L to 4000L).filterNot(deleted.toSet),
      s"got $inRange")
    // a skipped-groups read with NO deletions in range subtracts nothing
    val got2 = readIds(file, Some(dv), Seq(LessThanOrEqual("id", 200L)))
    assert(got2.filter(_ <= 200L) == (1L to 200L).filterNot(_ == 10L))
  }

  test("storage-partitioned (grouped) scan over a DV'd table stays exact") {
    val dir = tmpDir("augc")
    val t = CowTable(spark, dir + "/g", TableConfig("g", Seq("id"),
      partitionKey = Some("seg"), changeDataFeed = true,
      deletionVectors = true))
    t.create((1L to 90L).map(i => (i, s"s${i % 3}", i * 1.0))
      .toDF("id", "seg", "v"))
    t.delete(Seq(3L, 33L, 90L).toDF("id"))
    val sess = spark.newSession()
    sess.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val df = sess.read.format("graft").load(dir + "/g")
    assert(df.count() == 87)
    assert(df.groupBy("seg").agg(sum("v").as("s")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet ==
      (1L to 90L).filterNot(Set(3L, 33L, 90L))
        .groupBy(i => s"s${i % 3}")
        .map { case (k, is) => (k, is.map(_ * 1.0).sum) }.toSet)
  }
}
