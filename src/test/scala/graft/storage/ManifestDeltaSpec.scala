package graft.storage

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Delta-encoded commit manifests (log + checkpoint): the raw stored JSON
  * of an incremental commit carries only changed entries, while manifestAt
  * folds to the exact full file list — metadata O(changed files) per
  * commit, the property that holds at 100k-file scale. */
class ManifestDeltaSpec extends SparkSpec {
  import spark.implicits._

  private def rawJson(dir: String, v: Int): String =
    Files.readString(
      Paths.get(dir).resolve("_manifests").resolve(f"v$v%05d.json"))

  private def pathCount(json: String): Int = "\"path\"".r.findAllIn(json).length

  private def df(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, s"n$i")).toDF("id", "name")

  test("incremental commits store deltas; folds reproduce the full list") {
    val dir = tmpDir("mdelta") + "/t"
    val t = CowTable(spark, dir,
      TableConfig("t", Seq("id"), clusterByKey = true))
    t.create(df(1L to 400L).repartition(4)) // v1: full, 4 files
    assert(pathCount(rawJson(dir, 1)) == 4)
    t.upsert(df(Seq(7L))) // touches ONE clustered file
    val raw2 = rawJson(dir, 2)
    assert(raw2.contains("deltaRemoved"), s"expected a delta manifest:\n$raw2")
    assert(pathCount(raw2) <= 2, // the one rewritten file (± split)
      s"delta should carry only changed entries, got ${pathCount(raw2)}")
    // the folded view is the complete 4-file set with identical content
    assert(t.manifest(2).files.size == 4)
    assert(t.read().count() == 400)
    assert(t.read().filter($"id" === 7L).select("name").as[String]
      .collect().toSeq == Seq("n7"))
    // time travel across the delta chain stays exact
    assert(t.readVersion(1).filter($"id" === 7L).select("name").as[String]
      .collect().toSeq == Seq("n7"))
  }

  test("checkpoint every 8th version is a full manifest; chain stays exact") {
    val dir = tmpDir("mdelta") + "/t"
    val t = CowTable(spark, dir,
      TableConfig("t", Seq("id"), clusterByKey = true))
    t.create(df(1L to 400L).repartition(4))
    (2 to 10).foreach(v => t.upsert(df(Seq(v.toLong))))
    assert(t.currentVersion == 10)
    assert(!rawJson(dir, 8).contains("deltaRemoved"), "v8 must checkpoint")
    assert(rawJson(dir, 9).contains("deltaRemoved"))
    // every version folds to a complete, correct snapshot
    (1 to 10).foreach { v =>
      assert(t.readVersion(v).count() == 400, s"v$v row count")
    }
    assert(t.manifest(10).files.size >= 4)
    assert(t.manifest(10).deltaRemoved.isEmpty) // readers never see deltas
  }

  test("rollback, vacuum, and history work across delta manifests") {
    val dir = tmpDir("mdelta") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id")))
    t.create(df(1L to 100L))
    t.upsert(df(Seq(5L)))
    t.upsert(df(Seq(6L)))
    t.rollbackTo(2)
    assert(t.currentVersion == 4)
    assert(t.read().count() == 100)
    assert(t.history().count() == 4)
    t.vacuum(retainLast = 1, orphanOlderThanMs = Long.MaxValue)
    assert(t.read().count() == 100)
  }
}
