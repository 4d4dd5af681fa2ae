package graft.sources

import graft.SparkSpec
import graft.storage.{CowTable, TableConfig}
import org.apache.spark.sql.SparkSession

class GraftSpjSpec extends SparkSpec {

  private def mkTables(dir: String): Unit = {
    import spark.implicits._
    CowTable(spark, dir + "/a",
      TableConfig("a", Seq("id"), partitionKey = Some("seg"))).create(
      (1L to 200L).map(i => (i, s"seg${i % 5}", i * 1.0)).toDF("id", "seg", "x"))
    CowTable(spark, dir + "/b",
      TableConfig("b", Seq("k"), partitionKey = Some("seg"))).create(
      (1L to 50L).map(i => (i, s"seg${i % 5}", s"n$i")).toDF("k", "seg", "nm"))
  }

  private def spjSession(): SparkSession = {
    val sess = spark.newSession()
    sess.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    sess.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sess
  }

  test("co-partitioned graft tables join with zero shuffle (SPJ)") {
    val dir = tmpDir("spj")
    mkTables(dir)
    val sess = spjSession()
    val a = sess.read.format("graft").load(dir + "/a")
    val b = sess.read.format("graft").load(dir + "/b")
    val j = a.join(b, "seg")
    assert(j.count() == 200L * 10) // each a-row meets its seg's 10 b-rows
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("grouping is OFF without the bucketing conf (parallelism preserved)") {
    val dir = tmpDir("spj")
    mkTables(dir)
    // default session: one input partition per FILE, not per value
    val scan = spark.read.format("graft").load(dir + "/a")
    val parts = scan.rdd.getNumPartitions
    assert(parts >= 5, s"expected per-file partitions, got $parts")
    assert(scan.count() == 200L)
  }

  test("grouped scans return the same rows (concat reader, both modes)") {
    val dir = tmpDir("spj")
    mkTables(dir)
    val sess = spjSession()
    import sess.implicits._
    val grouped = sess.read.format("graft").load(dir + "/a")
      .as[(Long, String, Double)].collect().toSet
    val plain = {
      val s2 = spark.newSession()
      import s2.implicits._
      s2.read.format("graft").load(dir + "/a")
        .as[(Long, String, Double)].collect().toSet
    }
    assert(grouped == plain && grouped.size == 200)
    // row-oriented fallback through the same grouped partitions
    val rows = sess.read.format("graft").option("columnar", "false")
      .load(dir + "/a").as[(Long, String, Double)].collect().toSet
    assert(rows == plain)
  }

  test("null partition values group and join correctly") {
    val dir = tmpDir("spj")
    import spark.implicits._
    CowTable(spark, dir + "/a",
      TableConfig("a", Seq("id"), partitionKey = Some("seg"))).create(
      Seq((1L, "A", 1.0), (2L, null.asInstanceOf[String], 2.0))
        .toDF("id", "seg", "x"))
    val sess = spjSession()
    val back = sess.read.format("graft").load(dir + "/a")
    assert(back.count() == 2)
    assert(back.where("seg IS NULL").count() == 1)
  }
}
