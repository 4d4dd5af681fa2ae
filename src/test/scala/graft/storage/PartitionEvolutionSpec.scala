package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions.lit

class PartitionEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def rows(r: (Long, String, String, Double)*) =
    r.toSeq.toDF("id", "seg", "region", "v")

  private def fresh(pk: Option[String]): CowTable = {
    val dir = tmpDir("evo")
    CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      partitionKey = pk))
  }

  test("evolution commit is metadata-only: same files, dataChange=false") {
    val t0 = fresh(Some("seg"))
    t0.create(rows((1, "A", "eu", 1.0), (2, "B", "us", 2.0)))
    val before = t0.manifest(1).files.map(_.path).toSet
    val t1 = t0.alterPartitionKey(Some("region"))
    assert(t1.currentVersion == 2)
    val m2 = t1.manifest(2)
    assert(!m2.dataChange)
    assert(m2.files.map(_.path).toSet == before)
    assert(m2.partitionKey.contains("region"))
  }

  test("old layout reads back; new writes adopt the new spec") {
    val t0 = fresh(Some("seg"))
    t0.create(rows((1, "A", "eu", 1.0), (2, "B", "us", 2.0)))
    val t1 = t0.alterPartitionKey(Some("region"))
    t1.upsert(rows((3, "A", "ap", 3.0), (2, "B", "us", 2.5)))
    val m = t1.manifest(t1.currentVersion)
    // the upsert's fresh files live under the NEW key's dirs
    val freshPaths = m.files.map(_.path).filter(_.startsWith(
      f"v${t1.currentVersion}%05d"))
    assert(freshPaths.nonEmpty && freshPaths.forall(_.contains("region=")))
    assert(freshPaths.forall(!_.contains("seg=")))
    // untouched old-layout file (id=1's) still under the old key's dir
    assert(m.files.exists(_.path.contains("seg=A")))
    // BOTH partition columns read back correctly across both layouts
    assert(t1.read().as[(Long, String, String, Double)].collect().toSet ==
      Set((1L, "A", "eu", 1.0), (2L, "B", "us", 2.5), (3L, "A", "ap", 3.0)))
  }

  test("flat → partitioned and back") {
    val t0 = fresh(None)
    t0.create(rows((1, "A", "eu", 1.0)))
    val t1 = t0.alterPartitionKey(Some("seg"))
    t1.upsert(rows((2, "B", "us", 2.0)))
    assert(t1.manifest(t1.currentVersion).files
      .exists(_.path.contains("seg=B")))
    val t2 = t1.alterPartitionKey(None)
    t2.upsert(rows((3, "A", "ap", 3.0)))
    val freshPaths = t2.manifest(t2.currentVersion).files.map(_.path)
      .filter(_.startsWith(f"v${t2.currentVersion}%05d"))
    assert(freshPaths.nonEmpty && freshPaths.forall(!_.contains("=")))
    assert(t2.read().as[(Long, String, String, Double)].collect().toSet ==
      Set((1L, "A", "eu", 1.0), (2L, "B", "us", 2.0), (3L, "A", "ap", 3.0)))
  }

  test("time travel across the evolution boundary reads the old spec") {
    val t0 = fresh(Some("seg"))
    t0.create(rows((1, "A", "eu", 1.0)))
    val t1 = t0.alterPartitionKey(Some("region"))
    t1.upsert(rows((2, "B", "us", 2.0)))
    assert(t1.readVersion(1).as[(Long, String, String, Double)]
      .collect().toSet == Set((1L, "A", "eu", 1.0)))
  }

  test("unknown partition column fails loud") {
    val t0 = fresh(None)
    t0.create(rows((1, "A", "eu", 1.0)))
    val e = intercept[IllegalArgumentException] {
      t0.alterPartitionKey(Some("nope"))
    }
    assert(e.getMessage.contains("not in the table schema"))
  }

  // ---- TRANSFORM-spec evolution (Iceberg REPLACE PARTITION FIELD) ----

  private def tsRows(r: (Long, String, Double)*) =
    r.toSeq.toDF("id", "ts_s", "v")
      .selectExpr("id", "CAST(ts_s AS TIMESTAMP) AS ts", "v")

  test("day(ts) -> hour(ts): metadata-only; schema swaps generated cols; " +
      "mixed-era reads derive the new column exactly") {
    val dir = tmpDir("evo")
    val t0 = CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      partitionSpec = Some("day(ts)")))
    t0.create(tsRows(
      (1L, "2024-03-01 10:30:00", 1.0), (2L, "2024-03-02 23:10:00", 2.0)))
    val t1 = t0.alterPartitionSpec(Some("hour(ts)"))           // v2
    val m2 = t1.manifest(2)
    assert(!m2.dataChange)
    assert(m2.files == t0.manifest(1).files)                   // zero data
    assert(m2.partitionSpec.contains("hour(ts)"))
    assert(m2.priorSpecs == Seq("day(ts)"))
    val schema = CowTable.structFromJson(m2.schemaJson)
    assert(!schema.fieldNames.contains("ts_day"))              // retired
    assert(schema.fieldNames.contains("ts_hour"))
    // new write lands under ts_hour= dirs
    t1.upsert(tsRows((3L, "2024-03-03 07:45:00", 3.0)))        // v3
    val freshPaths = t1.manifest(3).files.map(_.path)
      .filter(_.startsWith("v00003"))
    assert(freshPaths.nonEmpty &&
      freshPaths.forall(_.contains("ts_hour=2024-03-03-07")), freshPaths)
    // API read: old-era rows DERIVE ts_hour from ts (never null)
    assert(t1.read().selectExpr("id", "ts_hour").as[(Long, String)]
      .collect().toSet == Set((1L, "2024-03-01-10"),
        (2L, "2024-03-02-23"), (3L, "2024-03-03-07")))
    // DSv2 read agrees (per-batch columnar backfill for the
    // pre-evolution files)
    val dsv2 = spark.read.format("graft").load(dir + "/t")
      .selectExpr("id", "ts_hour").as[(Long, String)].collect().toSet
    assert(dsv2 == Set((1L, "2024-03-01-10"), (2L, "2024-03-02-23"),
      (3L, "2024-03-03-07")))
  }

  test("pruning works on BOTH eras: source predicate replays through each " +
      "era's own transform") {
    val dir = tmpDir("evo")
    val t0 = CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      partitionSpec = Some("day(ts)")))
    t0.create(tsRows(
      (1L, "2024-03-01 10:00:00", 1.0), (2L, "2024-03-02 11:00:00", 2.0),
      (3L, "2024-03-03 12:00:00", 3.0)))
    val t1 = t0.alterPartitionSpec(Some("hour(ts)"))
    t1.upsert(tsRows(
      (4L, "2024-03-04 08:00:00", 4.0), (5L, "2024-03-04 09:00:00", 5.0),
      (6L, "2024-03-05 10:00:00", 6.0)))
    val df = spark.read.format("graft").load(dir + "/t")
    val total = t1.manifest(t1.currentVersion).files.size

    // NEW-era point predicate: prunes new files by hour AND old files by
    // day (2024-03-04 is not 03-01/02/03) — 1 file survives
    val q1 = df.filter($"ts" === java.sql.Timestamp.valueOf(
      "2024-03-04 08:00:00"))
    val p1 = q1.queryExecution.executedPlan.toString
    val m1 = """files=(\d+)/(\d+)""".r.findFirstMatchIn(p1).get
    assert(m1.group(2).toInt == total)
    assert(m1.group(1).toInt == 1, s"expected 1 file kept in:\n$p1")
    assert(p1.contains("priorEraFilters=1"), p1)
    assert(q1.select("id").as[Long].collect().toSeq == Seq(4L))

    // OLD-era range predicate: prunes old files by day replay and new
    // files by hour replay
    val q2 = df.filter($"ts" <= java.sql.Timestamp.valueOf(
      "2024-03-02 23:59:59"))
    val m2r = """files=(\d+)/(\d+)""".r.findFirstMatchIn(
      q2.queryExecution.executedPlan.toString).get
    assert(m2r.group(1).toInt == 2, m2r.group(0)) // the 03-01 + 03-02 files
    assert(q2.select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("maintenance across the boundary: compact migrates old files to " +
      "the new layout") {
    val dir = tmpDir("evo")
    val t0 = CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      partitionSpec = Some("day(ts)")))
    t0.create(tsRows(
      (1L, "2024-03-01 10:00:00", 1.0), (2L, "2024-03-01 11:00:00", 2.0)))
    val t1 = t0.alterPartitionSpec(Some("hour(ts)"))
    t1.upsert(tsRows((3L, "2024-03-02 05:00:00", 3.0)))
    // compact is Exchange-free by design: old-era files (no current-key
    // path segment) carry over UNTOUCHED, reads stay exact
    t1.compact(smallBytes = 1L << 30)
    assert(t1.read().selectExpr("id", "ts_hour").as[(Long, String)]
      .collect().toSet == Set((1L, "2024-03-01-10"),
        (2L, "2024-03-01-11"), (3L, "2024-03-02-05")))
    // OPTIMIZE rewrites through the write funnel — it MIGRATES old-era
    // files into the new layout (the era boundary heals under maintenance)
    t1.optimize(full = true)
    val after = t1.manifest(t1.currentVersion).files.map(_.path)
    assert(after.forall(_.contains("ts_hour=")), after)
    assert(after.forall(!_.contains("ts_day=")), after)
    assert(t1.read().selectExpr("id", "ts_hour").as[(Long, String)]
      .collect().toSet == Set((1L, "2024-03-01-10"),
        (2L, "2024-03-01-11"), (3L, "2024-03-02-05")))
  }

  test("identity -> transform and transform -> identity evolve cleanly") {
    val dir = tmpDir("evo")
    val t0 = CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      partitionKey = Some("v")))
    t0.create(tsRows((1L, "2024-03-01 10:00:00", 1.0)))
    val t1 = t0.alterPartitionSpec(Some("day(ts)"))
    t1.upsert(tsRows((2L, "2024-03-02 11:00:00", 2.0)))
    assert(t1.manifest(t1.currentVersion).files.exists(
      _.path.contains("ts_day=2024-03-02")))
    // the identity column is a data column — still readable everywhere
    assert(t1.read().select("id", "v").as[(Long, Double)].collect().toSet ==
      Set((1L, 1.0), (2L, 2.0)))
    val t2 = t1.alterPartitionSpec(Some("v"))
    t2.upsert(tsRows((3L, "2024-03-03 12:00:00", 3.0)))
    val m = t2.manifest(t2.currentVersion)
    assert(m.partitionKey.contains("v") && m.partitionSpec.isEmpty)
    assert(m.priorSpecs == Seq("day(ts)"))
    assert(!CowTable.structFromJson(m.schemaJson).fieldNames
      .contains("ts_day"))
    assert(t2.read().select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L))
  }

  test("SQL row-level writes on an era-mixed table read DERIVED generated " +
      "values (never nulls) and rewrite them correctly") {
    val lake = tmpDir("evo")
    val sess = spark.newSession()
    sess.conf.set("spark.sql.catalog.lake", "graft.sources.GraftCatalog")
    sess.conf.set("spark.sql.catalog.lake.warehouse", lake)
    val t0 = CowTable(sess, lake + "/t", TableConfig("t", Seq("id"),
      partitionSpec = Some("day(ts)")))
    t0.create(tsRows(
      (1L, "2024-03-01 10:00:00", 1.0), (2L, "2024-03-02 11:00:00", 2.0)))
    val t1 = t0.alterPartitionSpec(Some("hour(ts)"))
    graft.storage.LakeRegistry.register(lake, t1.config, "t")
    t1.upsert(tsRows((3L, "2024-03-03 12:00:00", 3.0)))
    // the UPDATE's row-level scan reads pre-evolution files — ts_hour must
    // arrive DERIVED (the rewrite then recomputes it on write anyway)
    sess.sql("UPDATE lake.default.t SET v = v + 10 WHERE id = 1")
    val got = sess.sql(
      "SELECT id, ts_hour, v FROM lake.default.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      (1L, "2024-03-01-10", 11.0), (2L, "2024-03-02-11", 2.0),
      (3L, "2024-03-03-12", 3.0)), got.mkString(", "))
    // a MERGE whose CONDITION references the generated column sees the
    // derived value on old-era rows too
    import sess.implicits._
    Seq((2L, 99.0)).toDF("id", "nv").createOrReplaceTempView("src")
    sess.sql("MERGE INTO lake.default.t t USING src s ON t.id = s.id " +
      "AND t.ts_hour = '2024-03-02-11' " +
      "WHEN MATCHED THEN UPDATE SET v = s.nv")
    assert(sess.sql("SELECT v FROM lake.default.t WHERE id = 2")
      .head().getDouble(0) == 99.0)
  }

  test("identity-on-source -> transform: old files' PATH-BORNE source " +
      "still derives the generated column (Iceberg's classic ts->days)") {
    val dir = tmpDir("evo")
    // identity-partitioned BY THE TRANSFORM SOURCE itself: old files carry
    // v only in the directory name, not in file bytes
    val t0 = CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      partitionKey = Some("v")))
    t0.create(tsRows((1L, "2024-03-01 10:00:00", 7.0)))
    val t1 = t0.alterPartitionSpec(Some("bucket(4,v)"))
    t1.upsert(tsRows((2L, "2024-03-02 11:00:00", 8.0)))
    val expected = Set(
      (1L, graft.storage.PartitionTransform.bucketLocal("7.0", 4)),
      (2L, graft.storage.PartitionTransform.bucketLocal("8.0", 4)))
    // DSv2: the old file's v is path-borne — the generated bucket derives
    // from the parsed dir constant, never null
    val got = spark.read.format("graft").load(dir + "/t")
      .select("id", "v_bucket").as[(Long, Long)].collect().toSet
    assert(got == expected, got.toString)
    // API read agrees
    assert(t1.read().select("id", "v_bucket").as[(Long, Long)]
      .collect().toSet == expected)
  }

  test("change feed across the evolution boundary derives the generated " +
      "column for retired-era commits") {
    val dir = tmpDir("evo")
    val t0 = CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      partitionSpec = Some("day(ts)"), changeDataFeed = true))
    t0.create(tsRows((1L, "2024-03-01 10:00:00", 1.0)))       // v1: day era
    val t1 = t0.alterPartitionSpec(Some("hour(ts)"))          // v2: evolve
    t1.upsert(tsRows((2L, "2024-03-02 05:00:00", 2.0)))       // v3: hour era
    // DSv2 feed: the v1 insert's file is a RETIRED-era data file — ts_hour
    // must arrive DERIVED, not null
    val feed = spark.read.format("graft").option("readChangeFeed", "true")
      .option("startingVersion", "1").load(dir + "/t")
      .select("id", "ts_hour", "_change_type", "_commit_version")
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    assert(feed == Set(
      (1L, "2024-03-01-10", "insert", 1),
      (2L, "2024-03-02-05", "insert", 3)), feed.toString)
    // API feed agrees
    val api = t1.readChangeFeed(0, t1.currentVersion)
      .select("id", "ts_hour", "_change_type", "_commit_version")
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    assert(api == feed, api.toString)
  }

  test("property: era-mixed pruning never drops matching rows (random " +
      "timestamp predicates over a random evolution cut)") {
    val rnd = new scala.util.Random(42)
    val dir = tmpDir("evo")
    val n = 600
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val span = 10L * 24 * 3600 * 1000 // 10 days
    val rows = (1L to n).map { i =>
      (i, new java.sql.Timestamp(base + (rnd.nextDouble() * span).toLong),
        i * 1.0)
    }
    import spark.implicits._
    val df = rows.toDF("id", "ts", "v")
    val cutMs = base + (span * (0.3 + rnd.nextDouble() * 0.4)).toLong
    val cut = new java.sql.Timestamp(cutMs)
    val t0 = CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      partitionSpec = Some("day(ts)")))
    t0.create(df.filter($"ts" < cut))
    val t1 = t0.alterPartitionSpec(Some("hour(ts)"))
    t1.upsert(df.filter($"ts" >= cut))
    val scan = spark.read.format("graft").load(dir + "/t")
    def expect(p: java.sql.Timestamp => Boolean): Set[Long] =
      rows.filter(r => p(r._2)).map(_._1).toSet
    (1 to 40).foreach { _ =>
      val a = new java.sql.Timestamp(base + (rnd.nextDouble() * span).toLong)
      val b = new java.sql.Timestamp(base + (rnd.nextDouble() * span).toLong)
      val (lo, hi) = if (a.before(b)) (a, b) else (b, a)
      val cases: Seq[(org.apache.spark.sql.Column,
        java.sql.Timestamp => Boolean)] = Seq(
        ($"ts" >= lo, ts => !ts.before(lo)),
        ($"ts" < hi, ts => ts.before(hi)),
        ($"ts" >= lo && $"ts" < hi, ts => !ts.before(lo) && ts.before(hi)),
        ($"ts" === lo, ts => ts == lo))
      cases.foreach { case (c, p) =>
        val got = scan.filter(c).select("id").as[Long].collect().toSet
        assert(got == expect(p),
          s"era-mixed prune dropped/invented rows for $c: " +
            s"missing=${expect(p) -- got} extra=${got -- expect(p)}")
      }
    }
  }

  test("same-name different-semantics evolution is rejected loudly") {
    val dir = tmpDir("evo")
    val t0 = CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      partitionSpec = Some("bucket(8,v)")))
    t0.create(tsRows((1L, "2024-03-01 10:00:00", 1.0)))
    val e = intercept[IllegalArgumentException] {
      t0.alterPartitionSpec(Some("bucket(16,v)"))
    }
    assert(e.getMessage.contains("different semantics"), e.getMessage)
  }

  test("a transform generating the name of a LIVE DATA column is rejected " +
      "(silent-overwrite guard)") {
    val dir = tmpDir("evo")
    val t0 = CowTable(spark, dir + "/t", TableConfig("t", Seq("id")))
    // ts_hour here is a plain user column — exactly the name hour(ts)
    // would generate; accepting it would overwrite the user's values on
    // every subsequent write and read old files' stored bytes as the
    // generated column
    t0.create(tsRows((1L, "2024-03-01 10:00:00", 1.0))
      .withColumn("ts_hour", lit("user-data")))
    val e = intercept[IllegalArgumentException] {
      t0.alterPartitionSpec(Some("hour(ts)"))
    }
    assert(e.getMessage.contains("DATA column"), e.getMessage)
    // re-adoption of a RETIRED generated column's own name stays legal
    val a0 = CowTable(spark, dir + "/a", TableConfig("a", Seq("id"),
      partitionSpec = Some("hour(ts)")))
    a0.create(tsRows((1L, "2024-03-01 10:00:00", 1.0)))
    val a1 = a0.alterPartitionSpec(Some("day(ts)"))
    val a2 = a1.alterPartitionSpec(Some("hour(ts)")) // re-adopt
    assert(a2.manifest(a2.currentVersion).partitionSpec
      .contains("hour(ts)"))
  }
}
