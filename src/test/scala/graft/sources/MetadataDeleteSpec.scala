package graft.sources

import graft.SparkSpec
import graft.storage.{CowTable, TableConfig}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTableWithFilters, LogicalPlan}
import org.apache.spark.sql.functions._

/** METADATA-ONLY DELETE ([[MetadataDelete]] + `GraftTable.deleteWhere`):
  * a DELETE whose predicate provably covers whole files must become one
  * manifest commit — zero data read, zero data written — and any predicate
  * the metadata cannot decide must fall back to the ordinary row-level
  * rewrite with identical results. The optimized logical plan is the
  * zero-data-jobs proof: `DeleteFromTableWithFilters` executes as a driver
  * `deleteWhere` call (no scan, no write job); a row-level fallback keeps
  * its `ReplaceData`/`WriteDelta`. */
class MetadataDeleteSpec extends SparkSpec {
  import spark.implicits._

  /** Plan-only probe — MUST NOT execute the statement. A default-mode
    * `executePlan(..).optimizedPlan` eagerly EXECUTES a DML command and
    * returns a `CommandResult` whose inner command `exists` never
    * traverses (constant-false probe + the DELETE runs as a side
    * effect — the round-14 red-suite bug). `CommandExecutionMode.SKIP`
    * optimizes the real plan without running it. */
  private def optimizedDelete(sql: String): LogicalPlan =
    spark.sessionState.executePlan(
      spark.sessionState.sqlParser.parsePlan(sql),
      org.apache.spark.sql.execution.CommandExecutionMode.SKIP).optimizedPlan

  private def isMetadataOnly(sql: String): Boolean =
    optimizedDelete(sql).exists {
      case _: DeleteFromTableWithFilters => true
      case _ => false
    }

  private def withSqlTable(dir: String, name: String)(body: => Unit): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    try {
      spark.sql(s"CREATE TABLE $name USING graft LOCATION '$dir'")
      body
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  private def eventsDf = (1 to 400).map { i =>
    (i.toLong, s"u${i % 7}",
      java.sql.Timestamp.valueOf(f"2024-01-${1 + (i - 1) * 20 / 400}%02d " +
        f"${i % 24}%02d:00:00"),
      i * 1.5)
  }.toDF("id", "user", "ts", "v")

  test("day-aligned retention DELETE on a day(ts) table is metadata-only") {
    val dir = tmpDir("mdel") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id"),
      partitionSpec = Some("day(ts)")))
    t.create(eventsDf)
    val before = t.manifest(t.currentVersion).files
    assert(before.size > 1)
    withSqlTable(dir, "mdel_day") {
      val sql = "DELETE FROM mdel_day WHERE ts < TIMESTAMP '2024-01-05 00:00:00'"
      assert(isMetadataOnly(sql), "day-aligned cut must convert")
      spark.sql(sql)
      assert(spark.table("mdel_day").count() ==
        eventsDf.filter(col("ts") >= lit("2024-01-05").cast("timestamp")).count())
    }
    val m = t.manifest(t.currentVersion)
    assert(m.version == 2, "exactly one commit")
    assert(m.files.map(_.path).toSet.subsetOf(before.map(_.path).toSet),
      "no data file may be written")
    assert(m.files.forall(e => !e.path.matches(".*ts_day=2024-01-0[1-4]/.*")),
      "all covered day dirs dropped")
    assert(before.map(_.path).toSet.diff(m.files.map(_.path).toSet).nonEmpty)
  }

  test("hour-aligned retention DELETE on an hour(ts) table is " +
      "metadata-only") {
    val dir = tmpDir("mdel") + "/t"
    val hourly = (1 to 96).map { i =>
      (i.toLong, s"u${i % 5}",
        java.sql.Timestamp.valueOf(
          f"2024-01-${1 + (i - 1) / 48}%02d ${(i - 1) / 2 % 24}%02d:30:00"),
        i * 1.0)
    }.toDF("id", "user", "ts", "v")
    val t = CowTable(spark, dir, TableConfig("t", Seq("id"),
      partitionSpec = Some("hour(ts)")))
    t.create(hourly)
    val before = t.manifest(t.currentVersion).files
    withSqlTable(dir, "mdel_hour") {
      val sql = "DELETE FROM mdel_hour WHERE ts < TIMESTAMP " +
        "'2024-01-01 12:00:00'"
      assert(isMetadataOnly(sql), "hour-aligned cut must convert")
      spark.sql(sql)
      assert(spark.table("mdel_hour").count() ==
        hourly.filter(
          col("ts") >= lit("2024-01-01 12:00:00").cast("timestamp")).count())
    }
    val m = t.manifest(t.currentVersion)
    assert(m.version == 2 && m.files.map(_.path).toSet
      .subsetOf(before.map(_.path).toSet), "zero data files written")
    assert(m.files.forall(e =>
      !e.path.matches(""".*ts_hour=2024-01-01-(0\d|10|11)/.*""")),
      "all covered hour dirs dropped")
  }

  test("mid-day cut declines to the row-level rewrite, same result") {
    val dir = tmpDir("mdel") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id"),
      partitionSpec = Some("day(ts)")))
    t.create(eventsDf)
    withSqlTable(dir, "mdel_mid") {
      val sql = "DELETE FROM mdel_mid WHERE ts < TIMESTAMP '2024-01-05 07:30:00'"
      assert(!isMetadataOnly(sql), "mid-day cut cannot be decided per file")
      spark.sql(sql)
      assert(spark.table("mdel_mid").count() ==
        eventsDf.filter(
          col("ts") >= lit("2024-01-05 07:30:00").cast("timestamp")).count())
    }
  }

  test("identity-partition equality and IN are metadata-only; nulls stay") {
    val dir = tmpDir("mdel") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id"),
      partitionKey = Some("user")))
    val withNull = eventsDf.withColumn("user",
      when(col("id") % 97 === 0, lit(null)).otherwise(col("user")))
    t.create(withNull)
    withSqlTable(dir, "mdel_part") {
      val sql = "DELETE FROM mdel_part WHERE user IN ('u1', 'u3')"
      assert(isMetadataOnly(sql))
      spark.sql(sql)
      // null-user rows match neither IN value — they must survive
      assert(spark.table("mdel_part").filter(col("user").isNull).count() ==
        withNull.filter(col("user").isNull).count())
      assert(spark.table("mdel_part")
        .filter(col("user").isin("u1", "u3")).count() == 0)
      val sqlNull = "DELETE FROM mdel_part WHERE user IS NULL"
      assert(isMetadataOnly(sqlNull), "null dir is exactly the null rows")
      spark.sql(sqlNull)
      assert(spark.table("mdel_part").filter(col("user").isNull).count() == 0)
    }
    assert(t.currentVersion == 3, "two metadata commits, no rewrites")
  }

  test("key-stat-covered range DELETE is metadata-only on clustered files") {
    val dir = tmpDir("mdel") + "/t"
    val t = CowTable(spark, dir,
      TableConfig("t", Seq("id"), clusterByKey = true))
    t.create(eventsDf.repartitionByRange(4, col("id")))
    val m1 = t.manifest(t.currentVersion)
    assert(m1.files.size > 1)
    // cut at one file's max key: that file is All, disjoint files are No
    val cut = m1.files.flatMap(_.maxKey).map(_.toLong).min
    withSqlTable(dir, "mdel_range") {
      val sql = s"DELETE FROM mdel_range WHERE id <= $cut"
      assert(isMetadataOnly(sql), s"cut $cut aligns with a file boundary")
      spark.sql(sql)
      assert(spark.table("mdel_range").count() ==
        eventsDf.filter(col("id") > cut).count())
      // a cut strictly inside a surviving file cannot convert
      assert(!isMetadataOnly(s"DELETE FROM mdel_range WHERE id <= ${cut + 1}"))
    }
    val m2 = t.manifest(t.currentVersion)
    assert(m2.files.map(_.path).toSet.subsetOf(m1.files.map(_.path).toSet))
  }

  test("DELETE with no WHERE clears the table in one manifest commit") {
    val dir = tmpDir("mdel") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id")))
    t.create(eventsDf)
    withSqlTable(dir, "mdel_all") {
      spark.sql("DELETE FROM mdel_all")
      assert(spark.table("mdel_all").count() == 0)
    }
    val m = t.manifest(t.currentVersion)
    assert(m.version == 2 && m.files.isEmpty)
  }

  test("DV table: dropped entry takes its sidecar; CDF emits the deletes") {
    val dir = tmpDir("mdel") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id"),
      partitionSpec = Some("day(ts)"),
      deletionVectors = true, changeDataFeed = true))
    t.create(eventsDf)
    // row-level delete first, so early files carry DV sidecars
    t.delete(eventsDf.filter(col("id") % 11 === 0).select("id"))
    val before = t.manifest(t.currentVersion)
    assert(before.files.exists(e =>
      e.dvPath.isDefined && e.path.contains("ts_day=2024-01-0")),
      "fixture must have a vectored file in the dropped range")
    val vBefore = t.currentVersion
    withSqlTable(dir, "mdel_dv") {
      val sql = "DELETE FROM mdel_dv WHERE ts < TIMESTAMP '2024-01-05 00:00:00'"
      assert(isMetadataOnly(sql), "DV stats describe physical rows, a " +
        "superset of live — coverage still decides")
      spark.sql(sql)
    }
    val after = t.manifest(t.currentVersion)
    assert(after.files.map(_.path).toSet.subsetOf(
      before.files.map(_.path).toSet))
    val expectLive = eventsDf
      .filter(col("ts") < lit("2024-01-05").cast("timestamp"))
      .filter(col("id") % 11 =!= 0).count()
    // the change feed's file-diff fallback emits exactly the dropped
    // files' LIVE rows (dv-marked positions already left at v2) as deletes
    // fromVersion is the EXCLUSIVE base: this window is exactly the
    // metadata-delete commit
    val feed = t.readChangeFeed(vBefore, t.currentVersion)
    assert(feed.filter(col("_change_type") === "delete").count() ==
      expectLive)
    assert(feed.filter(col("_change_type") =!= "delete").count() == 0)
  }

  test("time-travel handles refuse deleteWhere") {
    val dir = tmpDir("mdel") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id")))
    t.create(eventsDf)
    t.upsert(eventsDf.limit(10))
    val tbl = new GraftTable(java.nio.file.Paths.get(dir), 1, None,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("versionAsOf", "1")))
    assert(!tbl.canDeleteWhere(
      Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.AlwaysTrue())))
    intercept[UnsupportedOperationException] {
      tbl.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.AlwaysTrue()))
    }
  }
}
