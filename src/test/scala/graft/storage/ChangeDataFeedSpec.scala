package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChangeDataFeedSpec extends SparkSpec {
  import spark.implicits._

  private def cfg = TableConfig("t", Seq("id"), changeDataFeed = true)

  test("upsert/delete commits materialize ROW-exact change files") {
    val dir = tmpDir("cdf")
    val t = CowTable(spark, dir + "/t", cfg)
    // v1: 100 rows in FEW files — neighbors share files with changed keys
    t.create((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"))
    // v2: update 3 keys + insert 2 new ones (same multi-row files rewritten)
    t.upsert(Seq((10L, "V10"), (20L, "V20"), (30L, "V30"),
      (101L, "v101"), (102L, "v102")).toDF("id", "v"))
    // v3: delete 2 keys
    t.delete(Seq(10L, 101L).toDF("id"))

    assert(t.manifest(2).cdcDir.isDefined && t.manifest(3).cdcDir.isDefined)

    val feed = t.readChangeFeed(1, 3)
      .select("id", "v", "_commit_version", "_change_type")
      .as[(Long, String, Int, String)].collect().toSet
    // ROW-exact: rewritten files' untouched neighbors never appear;
    // updates carry PAIRED pre/post images (Delta's CDF contract)
    assert(feed == Set(
      (10L, "v10", 2, "update_preimage"),
      (20L, "v20", 2, "update_preimage"),
      (30L, "v30", 2, "update_preimage"),
      (10L, "V10", 2, "update_postimage"),
      (20L, "V20", 2, "update_postimage"),
      (30L, "V30", 2, "update_postimage"),
      (101L, "v101", 2, "insert"),
      (102L, "v102", 2, "insert"),
      (10L, "V10", 3, "delete"),
      (101L, "v101", 3, "delete")), feed)
  }

  test("without the flag the same history over-reports (file-level feed)") {
    val dir = tmpDir("cdf")
    val t = CowTable(spark, dir + "/t", TableConfig("t", Seq("id")))
    t.create((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"))
    t.upsert(Seq((10L, "V10")).toDF("id", "v"))
    val feed = t.readChangeFeed(1, 2)
    // the file-diff join re-reports every row of the rewritten file(s)
    assert(feed.count() > 1, feed.count())
    assert(t.manifest(2).cdcDir.isEmpty)
  }

  test("feed mixes materialized and reconstructed commits seamlessly") {
    val dir = tmpDir("cdf")
    val t = CowTable(spark, dir + "/t", cfg)
    t.create((1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"))   // v1
    t.upsert(Seq((60L, "v60")).toDF("id", "v"))                   // v2 cdc
    t.compact(smallBytes = 1L << 30)                              // v3 skip
    t.upsert(Seq((60L, "V60")).toDF("id", "v"))                   // v4 cdc
    val feed = t.readChangeFeed(1, 4)
      .select("id", "_commit_version", "_change_type")
      .as[(Long, Int, String)].collect().toSet
    assert(feed == Set((60L, 2, "insert"), (60L, 4, "update_preimage"),
      (60L, 4, "update_postimage")), feed)
  }

  test("vacuum removes expired commits' change dirs, keeps recent ones") {
    val dir = tmpDir("cdf")
    val t = CowTable(spark, dir + "/t", cfg)
    t.create((1L to 20L).map(i => (i, s"v$i")).toDF("id", "v"))
    t.upsert(Seq((1L, "a")).toDF("id", "v"))  // v2 cdc
    t.upsert(Seq((2L, "b")).toDF("id", "v"))  // v3 cdc
    t.upsert(Seq((3L, "c")).toDF("id", "v"))  // v4 cdc
    val root = java.nio.file.Paths.get(dir + "/t")
    val v2cdc = root.resolve(t.manifest(2).cdcDir.get)
    val v4cdc = root.resolve(t.manifest(4).cdcDir.get)
    assert(java.nio.file.Files.isDirectory(v2cdc))
    t.vacuum(retainLast = 1)
    assert(!java.nio.file.Files.exists(v2cdc), "expired cdc dir survived")
    assert(java.nio.file.Files.isDirectory(v4cdc), "live cdc dir deleted")
  }

  test("batch connector CDF read matches the API feed, windowed by options") {
    val dir = tmpDir("cdf")
    val t = CowTable(spark, dir + "/t", cfg)
    t.create((1L to 30L).map(i => (i, s"v$i")).toDF("id", "v"))        // v1
    t.upsert(Seq((5L, "V5"), (31L, "v31")).toDF("id", "v"))            // v2
    t.delete(Seq(Tuple1(7L)).toDF("id"))                               // v3

    def feed(opts: Map[String, String]) = opts.foldLeft(
      spark.read.format("graft").option("readChangeFeed", "true")) {
        case (r, (k, v)) => r.option(k, v)
      }.load(dir + "/t")

    // full feed (insert load + changes) equals the API feed row-for-row
    val viaScan = feed(Map.empty)
      .select("id", "v", "_commit_version", "_change_type")
      .as[(Long, String, Int, String)].collect().toSet
    val viaApi = t.readChangeFeed(0, 3)
      .select("id", "v", "_commit_version", "_change_type")
      .as[(Long, String, Int, String)].collect().toSet
    assert(viaScan == viaApi)
    // _commit_timestamp rides along as a real column
    assert(feed(Map.empty).select("_commit_timestamp")
      .distinct().count() == 3)

    // startingVersion/endingVersion window the feed — both INCLUSIVE,
    // Delta's convention (startingVersion=2 includes v2's changes)
    val windowed = feed(Map("startingVersion" -> "2", "endingVersion" -> "2"))
      .select("id", "_commit_version", "_change_type")
      .as[(Long, Int, String)].collect().toSet
    assert(windowed == Set((5L, 2, "update_preimage"),
      (5L, 2, "update_postimage"), (31L, 2, "insert")), windowed)

    // versionAsOf caps the default end
    assert(feed(Map("versionAsOf" -> "2", "startingVersion" -> "2"))
      .select("_commit_version").distinct()
      .as[Int].collect().toSeq == Seq(2))

    // a mutation commit WITHOUT materialized change files fails loud
    val plain = CowTable(spark, dir + "/p", TableConfig("p", Seq("id")))
    plain.create(Seq((1L, "a")).toDF("id", "v"))
    plain.upsert(Seq((1L, "b")).toDF("id", "v"))
    val err = intercept[Exception] {
      spark.read.format("graft").option("readChangeFeed", "true")
        .load(dir + "/p").collect()
    }
    assert(err.getMessage.contains("changeDataFeed") ||
      Option(err.getCause).exists(_.getMessage.contains("changeDataFeed")),
      err.getMessage)
  }

  test("startingTimestamp/endingTimestamp window the batch feed (Delta parity)") {
    val dir = tmpDir("cdf")
    // deterministic commit clock: v1 @ 10:00, v2 @ 11:00, v3 @ 12:00 UTC
    def utcMs(s: String): Long = java.time.LocalDateTime
      .parse(s.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    val ticks = Iterator("2024-05-01 10:00:00", "2024-05-01 11:00:00",
      "2024-05-01 12:00:00").map(utcMs)
    val t = CowTable(spark, dir + "/t", cfg).withClock(() => ticks.next())
    t.create((1L to 30L).map(i => (i, s"v$i")).toDF("id", "v"))        // v1
    t.upsert(Seq((5L, "V5"), (31L, "v31")).toDF("id", "v"))            // v2
    t.delete(Seq(Tuple1(7L)).toDF("id"))                               // v3

    def feed(opts: (String, String)*) = opts.foldLeft(
      spark.read.format("graft").option("readChangeFeed", "true")) {
        case (r, (k, v)) => r.option(k, v)
      }.load(dir + "/t")

    // a timestamp BETWEEN v1 and v2 starts the feed at v2 (earliest commit
    // at-or-after); an exact commit time is inclusive
    assert(feed("startingTimestamp" -> "2024-05-01 10:30:00")
      .select("_commit_version").distinct().as[Int].collect().toSet ==
      Set(2, 3))
    assert(feed("startingTimestamp" -> "2024-05-01 11:00:00",
        "endingTimestamp" -> "2024-05-01 11:59:59")
      .select("id", "_commit_version", "_change_type")
      .as[(Long, Int, String)].collect().toSet ==
      Set((5L, 2, "update_preimage"), (5L, 2, "update_postimage"),
        (31L, 2, "insert")))
    // a DATE string parses as midnight
    assert(feed("endingTimestamp" -> "2024-05-02")
      .select("_commit_version").distinct().as[Int].collect().toSet ==
      Set(1, 2, 3))
    // out-of-range and conflicting options fail loud
    def msgChain(x: Throwable): String =
      if (x == null) "" else x.getMessage + "|" + msgChain(x.getCause)
    val late = intercept[Exception](
      feed("startingTimestamp" -> "2024-05-01 12:00:01").collect())
    assert(msgChain(late).contains("after the last commit"), msgChain(late))
    val early = intercept[Exception](
      feed("endingTimestamp" -> "2024-05-01 09:00:00").collect())
    assert(msgChain(early).contains("precedes the first commit"),
      msgChain(early))
    val conflict = intercept[Exception](
      feed("startingVersion" -> "2",
        "startingTimestamp" -> "2024-05-01 11:00:00").collect())
    assert(msgChain(conflict).contains("conflict"), msgChain(conflict))
  }

  test("precombine upstream + schema evolution still feed exactly") {
    val dir = tmpDir("cdf")
    val t = CowTable(spark, dir + "/t", cfg)
    t.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // evolving upsert adds a column; feed conforms to the final schema
    t.upsert(Seq((2L, "B", 9.5), (3L, "c", 1.0)).toDF("id", "v", "w"))
    val feed = t.readChangeFeed(1, 2)
      .select("id", "v", "w", "_change_type")
      .as[(Long, String, Option[Double], String)].collect().toSet
    assert(feed == Set(
      (2L, "b", None, "update_preimage"), // predates w: null-fills
      (2L, "B", Some(9.5), "update_postimage"),
      (3L, "c", Some(1.0), "insert")), feed)
  }
}
