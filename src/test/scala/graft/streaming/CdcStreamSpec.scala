package graft.streaming

import graft.SparkSpec
import graft.pipeline.CdcPipeline
import graft.storage.{CowTable, TableConfig}
import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def cfg = TableConfig("users", Seq("id"), precombineKey = Some("seq"))

  private def newTable(dir: String): CowTable = {
    val t = CowTable(spark, dir + "/users", cfg)
    t.create(Seq((1L, "alice", 0L), (2L, "bob", 0L)).toDF("id", "name", "seq"))
    t
  }

  private def batch(rows: (String, String, Long, String, Long)*): DataFrame =
    rows.toSeq.toDF("Op", "timestamp", "id", "name", "seq")

  private def writeWithMtime(df: DataFrame, dir: String, mtime: Long): Unit = {
    val before = listParquet(dir)
    df.coalesce(1).write.mode("append").parquet(dir)
    (listParquet(dir).toSet -- before).foreach(p =>
      Files.setLastModifiedTime(p, FileTime.fromMillis(mtime)))
  }

  private def listParquet(dir: String): Set[Path] =
    if (!Files.isDirectory(Paths.get(dir))) Set.empty
    else Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSet

  test("streamed micro-batches converge to the batch pipeline result") {
    val dir = tmpDir("stream")
    val cdcDir = dir + "/cdc"
    val b1 = batch(
      ("U", "2024-01-01 10:00:00", 1L, "alice2", 1L),
      ("I", "2024-01-01 11:00:00", 3L, "carol", 2L))
    val b2 = batch(
      ("D", "2024-01-02 10:00:00", 2L, "bob", 3L),
      ("U", "2024-01-02 11:00:00", 3L, "carol2", 4L))
    writeWithMtime(b1, cdcDir, 1000000000000L)
    writeWithMtime(b2, cdcDir, 1000000600000L)

    val streamed = newTable(dir + "/s")
    CdcStream.runAvailableNow(spark, streamed, cdcDir, dir + "/ckpt",
      b1.schema, auditTs = lit("2024-06-01 00:00:00").cast("timestamp"))

    val batched = newTable(dir + "/b")
    CdcPipeline.applyBatch(batched, b1.unionAll(b2),
      auditTs = lit("2024-06-01 00:00:00").cast("timestamp"))

    def state(t: CowTable) = t.read().select("id", "name")
      .as[(Long, String)].collect().toSet
    assert(state(streamed) == state(batched))
    assert(state(streamed) == Set((1L, "alice2"), (3L, "carol2")))
  }

  test("checkpoint = bookmark: a second AvailableNow run applies nothing new") {
    val dir = tmpDir("stream")
    val cdcDir = dir + "/cdc"
    writeWithMtime(batch(("U", "2024-01-01 10:00:00", 1L, "v1", 1L)),
      cdcDir, 1000000000000L)
    val t = newTable(dir + "/s")
    CdcStream.runAvailableNow(spark, t, cdcDir, dir + "/ckpt", batch().schema)
    val v = t.currentVersion
    CdcStream.runAvailableNow(spark, t, cdcDir, dir + "/ckpt", batch().schema)
    assert(t.currentVersion == v) // no new commits without new files
    // new file arrives → exactly it is applied
    writeWithMtime(batch(("U", "2024-01-02 10:00:00", 1L, "v2", 2L)),
      cdcDir, 1000000600000L)
    CdcStream.runAvailableNow(spark, t, cdcDir, dir + "/ckpt", batch().schema)
    assert(t.read().filter($"id" === 1L).select("name").as[String].head() == "v2")
  }
}
