package graft.sources

import graft.SparkSpec
import graft.storage.{CowTable, TableConfig}
import org.apache.spark.sql.functions._

/** Partial aggregate pushdown: when deletion vectors / stat-less files
  * make the complete manifest answer impossible, only the undecidable
  * files are read — and the merged result is exact. */
class PartialAggSpec extends SparkSpec {
  import spark.implicits._

  test("MIN/MAX/COUNT stay pushed under a deletion vector, one file read") {
    val dir = tmpDir("pagg")
    val t = CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      clusterByKey = true, changeDataFeed = true, deletionVectors = true))
    t.create((1L to 400L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartition(4))
    // vector away the top ids: the extremum of the top file is deleted,
    // so a manifest-only answer would be WRONG (max=400); the partial
    // path must read exactly that one file and recover max=379
    t.delete((380L to 400L).toDF("id"))
    val df = spark.read.format("graft").load(dir + "/t")
      .agg(min("id").as("mn"), max("id").as("mx"), count(lit(1)).as("cnt"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_agg_pushdown"), plan)
    assert(plan.contains("1 manifest row(s) + 1/4 files read"), plan)
    assert(df.as[(Long, Long, Long)].head() == ((1L, 379L, 379L)))
  }

  test("count(col) with nulls: DV'd file re-counted, clean files folded") {
    val dir = tmpDir("pagg")
    val t = CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      clusterByKey = true, changeDataFeed = true, deletionVectors = true,
      statsColumns = Seq("v")))
    // v null on every 10th row
    t.create((1L to 300L).map(i =>
      (i, if (i % 10 == 0) None else Some(i * 2L))).toDF("id", "v")
      .repartition(3))
    // delete 5 null-v and 5 non-null-v rows from the first file
    t.delete(Seq(10L, 20L, 30L, 40L, 50L, 1L, 2L, 3L, 4L, 5L).toDF("id"))
    val df = spark.read.format("graft").load(dir + "/t")
      .agg(count("v").as("cv"), count(lit(1)).as("c"),
        min("v").as("mnv"), max("v").as("mxv"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_agg_pushdown"), plan)
    assert(plan.contains("1/3 files read"), plan)
    // full table: 300 rows, 30 null v; deleted: 10 rows of which 5 null-v
    // ⇒ count(v) = 270−5, count(*) = 290; min v = id 6 ⇒ 12; max v =
    // id 299 ⇒ 598 (id 300's v is null)
    assert(df.as[(Long, Long, Long, Long)].head() ==
      ((265L, 290L, 12L, 598L)))
  }

  test("clean table still answers COMPLETE (partial never shadows it)") {
    val dir = tmpDir("pagg")
    CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      clusterByKey = true)).create(
      (1L to 100L).map(i => (i, s"n$i")).toDF("id", "name").repartition(2))
    val df = spark.read.format("graft").load(dir + "/t")
      .agg(min("id").as("mn"), max("id").as("mx"), count(lit(1)).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // the complete path plans a LocalTableScan over manifest_agg_ columns
    assert(plan.contains("manifest_agg_"), plan)
    assert(!plan.contains("partial_agg"), plan)
    assert(df.as[(Long, Long, Long)].head() == ((1L, 100L, 100L)))
  }

  test("timestamp stats column: DV'd extremum recovered exactly") {
    val dir = tmpDir("pagg")
    def ts(d: Int) = java.sql.Timestamp.from(
      java.time.LocalDateTime.of(2024, 3, d, 12, 0)
        .toInstant(java.time.ZoneOffset.UTC))
    val t = CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      clusterByKey = true, changeDataFeed = true, deletionVectors = true,
      statsColumns = Seq("ts")))
    t.create((1 to 28).map(d => (d.toLong, ts(d))).toDF("id", "ts")
      .repartition(2))
    t.delete(Seq(28L, 27L).toDF("id")) // the max-ts rows
    val df = spark.read.format("graft").load(dir + "/t")
      .agg(max("ts").as("mx"), min("ts").as("mn"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_agg_pushdown"), plan)
    assert(df.as[(java.sql.Timestamp, java.sql.Timestamp)].head() ==
      ((ts(26), ts(1))))
  }

  test("GROUP BY partition key: clean groups fold, DV'd file re-aggregated") {
    val dir = tmpDir("pagg")
    val t = CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      partitionKey = Some("seg"), clusterByKey = true,
      changeDataFeed = true, deletionVectors = true))
    t.create((1L to 300L).map(i =>
      (i, Seq("A", "B", "C")(((i - 1) / 100).toInt), s"n$i"))
      .toDF("id", "seg", "name"))
    // vector rows out of segment B only: A and C stay manifest-answerable
    t.delete((101L to 120L).toDF("id"))
    val df = spark.read.format("graft").load(dir + "/t")
      .groupBy("seg")
      .agg(count(lit(1)).as("c"), min("id").as("mn"), max("id").as("mx"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_agg_pushdown"), plan)
    assert(plan.contains("2 manifest row(s) + 1/3 files read"), plan)
    assert(df.as[(String, Long, Long, Long)].collect().toSet == Set(
      ("A", 100L, 1L, 100L),
      ("B", 80L, 121L, 200L),
      ("C", 100L, 201L, 300L)))
  }

  test("differential sweep: random DV populations, engine == brute force") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 10) {
      val dir = tmpDir("pagg")
      val n = 60 + rnd.nextInt(140)
      val rows = (1L to n.toLong).map(i =>
        (i, if (rnd.nextInt(7) == 0) None else Some(rnd.nextInt(1000).toLong)))
      val t = CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
        clusterByKey = rnd.nextBoolean(), changeDataFeed = true,
        deletionVectors = true, statsColumns = Seq("v")))
      t.create(rows.toDF("id", "v").repartition(2 + rnd.nextInt(3)))
      val deleted = rows.map(_._1).filter(_ => rnd.nextInt(4) == 0)
      if (deleted.nonEmpty) t.delete(deleted.toDF("id"))
      val live = rows.filterNot(r => deleted.contains(r._1))
      val vs = live.flatMap(_._2)
      val got = spark.read.format("graft").load(dir + "/t")
        .agg(min("id").as("a"), max("id").as("b"), count(lit(1)).as("c"),
          count("v").as("d"), min("v").as("e"), max("v").as("f"))
        .as[(Option[Long], Option[Long], Long, Long, Option[Long], Option[Long])]
        .head()
      val want = (live.headOption.map(_ => live.map(_._1).min),
        live.headOption.map(_ => live.map(_._1).max),
        live.size.toLong, vs.size.toLong,
        if (vs.isEmpty) None else Some(vs.min),
        if (vs.isEmpty) None else Some(vs.max))
      assert(got == want, s"trial $trial (deleted ${deleted.size}/$n): " +
        s"$got != $want")
    }
  }

  test("every file DV'd declines partial (no benefit), results exact") {
    val dir = tmpDir("pagg")
    val t = CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      clusterByKey = true, changeDataFeed = true, deletionVectors = true))
    t.create((1L to 100L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartition(2))
    t.delete(Seq(1L, 100L).toDF("id")) // touches both files
    val df = spark.read.format("graft").load(dir + "/t")
      .agg(min("id").as("mn"), max("id").as("mx"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("partial_agg_pushdown"), plan)
    assert(df.as[(Long, Long)].head() == ((2L, 99L)))
  }
}
