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

  test("parquet checkpoints: a big full manifest externalizes its file " +
      "list; manifestAt round-trips bit-identically (incl. stats maps, DVs)") {
    val dir = tmpDir("mdelta") + "/t"
    spark.conf.set("graft.parquetCheckpointMinFiles", "2")
    try {
      val t = CowTable(spark, dir, TableConfig("t", Seq("id"),
        statsColumns = Seq("name"), changeDataFeed = true,
        deletionVectors = true, ndvSketch = true))
      t.create(df(1L to 300L).repartition(4)) // v1: full + over threshold
      val raw1 = rawJson(dir, 1)
      assert(raw1.contains("filesParquet"),
        s"v1 must externalize to parquet:\n$raw1")
      assert(pathCount(raw1) <= 1, "file entries must leave the JSON")
      val sidecars = Files.list(Paths.get(dir).resolve("_manifests"))
      val names = try {
        import scala.jdk.CollectionConverters._
        sidecars.iterator().asScala.map(_.getFileName.toString).toSeq
      } finally sidecars.close()
      assert(names.exists(_.endsWith(".files.parquet")), names)
      // round-trip: every stat field survives the parquet encoding
      val m1 = t.manifest(1)
      assert(m1.filesParquet.isEmpty, "readers never see the pointer")
      assert(m1.files.size == 4)
      assert(m1.files.forall(e => e.minKey.isDefined && e.maxKey.isDefined))
      assert(m1.files.forall(_.extra.contains("name")))
      assert(m1.files.forall(_.nulls.nonEmpty))
      assert(m1.files.forall(_.ndv.nonEmpty))
      // DV'd commit folds over the parquet checkpoint exactly
      t.delete(Seq(7L, 8L).toDF("id"))
      assert(t.read().count() == 298)
      val m2 = t.manifest(2)
      assert(m2.files.exists(_.dvPath.isDefined))
      // a DV'd entry inside a LATER parquet checkpoint round-trips too
      (3 to 8).foreach(v => t.upsert(df(Seq(v.toLong * 1000))))
      assert(t.currentVersion == 8)
      val raw8 = rawJson(dir, 8)
      assert(raw8.contains("filesParquet"), "v8 checkpoint must be parquet")
      val m8 = t.manifest(8)
      assert(m8.files.exists(_.dvPath.isDefined))
      assert(t.read().count() == 304)
      assert(t.readVersion(1).count() == 300) // time travel across both
      // scans, pruning, CDF keep working over the encoded history
      assert(t.read().filter($"id" === 7L).count() == 0)
      assert(t.readChangeFeed(1, 2).count() == 2)
    } finally spark.conf.unset("graft.parquetCheckpointMinFiles")
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
