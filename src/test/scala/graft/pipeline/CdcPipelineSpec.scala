package graft.pipeline

import graft.SparkSpec
import graft.storage.{CowTable, TableConfig}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class CdcPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def cfg = TableConfig("users", Seq("id"), precombineKey = Some("seq"))

  private def newTable(): CowTable = {
    val t = CowTable(spark, tmpDir("cdc") + "/users", cfg)
    t.create(Seq((1L, "alice", 0L), (2L, "bob", 0L), (3L, "carol", 0L))
      .toDF("id", "name", "seq"))
    t
  }

  /** DMS-shaped batch: Op, timestamp, full row image. */
  private def batch(rows: (String, String, Long, String, Long)*): DataFrame =
    rows.toSeq.toDF("Op", "timestamp", "id", "name", "seq")

  private def state(t: CowTable): Map[Long, String] =
    t.read().select("id", "name").as[(Long, String)].collect().toMap

  test("CDC merge over a hive-partitioned table, including partition moves") {
    val pcfg = TableConfig("users", Seq("id"),
      partitionKey = Some("seg"), precombineKey = Some("seq"))
    val t = CowTable(spark, tmpDir("cdcp") + "/users", pcfg)
    t.create(Seq((1L, "A", "alice", 0L), (2L, "B", "bob", 0L))
      .toDF("id", "seg", "name", "seq"))
    val b = Seq(
      ("U", "2024-01-01 10:00:00", 1L, "B", "alice2", 1L), // A -> B move
      ("I", "2024-01-01 10:00:00", 3L, "A", "carol", 1L),
      ("D", "2024-01-01 11:00:00", 2L, "B", "bob", 2L))
      .toDF("Op", "timestamp", "id", "seg", "name", "seq")
    CdcPipeline.applyBatch(t, b, auditTs = lit("2024-06-01").cast("timestamp"))
    val out = t.read().select("id", "seg", "name")
      .as[(Long, String, String)].collect().toSet
    assert(out == Set((1L, "B", "alice2"), (3L, "A", "carol")))
    // the moved row lives under its NEW hive partition dir, exactly once
    val files = t.manifest(t.currentVersion).files.map(_.path)
    assert(files.exists(_.contains("seg=B")))
    assert(t.read().filter(col("id") === 1L).count() == 1)
  }

  test("upsert + delete routing, upserts applied before deletes") {
    val t = newTable()
    val b = batch(
      ("U", "2024-01-01 10:00:00", 1L, "alice2", 1L),
      ("I", "2024-01-01 10:00:00", 4L, "dave", 2L),
      ("D", "2024-01-01 10:00:00", 2L, "bob", 3L))
    val res = CdcPipeline.applyBatch(t, b,
      auditTs = lit("2024-06-01 00:00:00").cast("timestamp"))
    assert(res.opCounts == Map("U" -> 1L, "I" -> 1L, "D" -> 1L))
    assert(state(t) == Map(1L -> "alice2", 3L -> "carol", 4L -> "dave"))
    // audit column present on merged rows, null on untouched rows
    val audit = t.read().select("id", "last_applied_date")
      .as[(Long, Option[java.sql.Timestamp])].collect().toMap
    assert(audit(1L).isDefined && audit(3L).isEmpty)
  }

  test("within-batch dedup: only the max-timestamp row per key is applied") {
    val t = newTable()
    CdcPipeline.applyBatch(t, batch(
      ("U", "2024-01-01 10:00:00", 1L, "mid", 1L),
      ("U", "2024-01-02 10:00:00", 1L, "final", 2L),
      ("I", "2024-01-01 09:00:00", 1L, "early", 3L)))
    assert(state(t)(1L) == "final")
  }

  test("tie on timestamp breaks deterministically on precombine (seq)") {
    val t = newTable()
    CdcPipeline.applyBatch(t, batch(
      ("U", "2024-01-01 10:00:00", 1L, "low-seq", 1L),
      ("U", "2024-01-01 10:00:00", 1L, "high-seq", 9L)))
    assert(state(t)(1L) == "high-seq")
  }

  test("key whose final op is D is removed even when an I/U precedes it") {
    val t = newTable()
    CdcPipeline.applyBatch(t, batch(
      ("I", "2024-01-01 10:00:00", 5L, "eve", 1L),
      ("D", "2024-01-02 10:00:00", 5L, "eve", 2L)))
    assert(!state(t).contains(5L))
  }

  test("replaying the same batch is idempotent (crash-recovery safety)") {
    val t = newTable()
    val b = batch(
      ("U", "2024-01-01 10:00:00", 1L, "alice2", 1L),
      ("D", "2024-01-01 10:00:00", 3L, "carol", 2L))
    CdcPipeline.applyBatch(t, b,
      auditTs = lit("2024-06-01 00:00:00").cast("timestamp"))
    val s1 = state(t)
    CdcPipeline.applyBatch(t, b,
      auditTs = lit("2024-06-01 00:00:00").cast("timestamp"))
    assert(state(t) == s1)
  }

  test("time-ordered prefix split converges to the same state as one batch") {
    val all = Seq(
      ("I", "2024-01-01 01:00:00", 10L, "a", 1L),
      ("U", "2024-01-01 02:00:00", 10L, "b", 2L),
      ("U", "2024-01-01 03:00:00", 11L, "c", 3L),
      ("D", "2024-01-01 04:00:00", 10L, "b", 4L),
      ("U", "2024-01-01 05:00:00", 11L, "d", 5L))
    val oneShot = newTable()
    CdcPipeline.applyBatch(oneShot, batch(all: _*))
    for (split <- 1 until all.size) {
      val t = newTable()
      CdcPipeline.applyBatch(t, batch(all.take(split): _*))
      CdcPipeline.applyBatch(t, batch(all.drop(split): _*))
      assert(state(t) == state(oneShot), s"split at $split diverged")
    }
  }

  test("bookmarked run consumes each file once; empty batch exits early") {
    val t = newTable()
    val cdcDir = tmpDir("cdcfiles")
    val bmPath = cdcDir + "/_bookmark.json"
    batch(("U", "2024-01-01 10:00:00", 1L, "v1", 1L))
      .coalesce(1).write.mode("append").parquet(cdcDir)
    val r1 = CdcPipeline.run(spark, t, cdcDir, bmPath)
    assert(r1.isDefined && state(t)(1L) == "v1")
    // no new files → "No Data changed." early exit, no commit
    val vBefore = t.currentVersion
    assert(CdcPipeline.run(spark, t, cdcDir, bmPath).isEmpty)
    assert(t.currentVersion == vBefore)
    // a second file arrives → only it is consumed
    batch(("U", "2024-01-02 10:00:00", 1L, "v2", 2L))
      .coalesce(1).write.mode("append").parquet(cdcDir)
    assert(CdcPipeline.run(spark, t, cdcDir, bmPath).isDefined)
    assert(state(t)(1L) == "v2")
  }
}
