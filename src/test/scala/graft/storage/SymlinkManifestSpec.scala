package graft.storage

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class SymlinkManifestSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("id", "seg")

  private def listed(root: String, rels: Seq[String]): Seq[String] =
    rels.flatMap(r => Files.readString(Paths.get(root).resolve(r))
      .split('\n').toSeq.filter(_.nonEmpty))

  test("flat table: one manifest listing exactly the current snapshot") {
    val dir = tmpDir("sym") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id")))
    t.create(df((1L, "a"), (2L, "b")))
    val m1 = t.generateSymlinkManifest()
    assert(m1 == Seq("_symlink_format_manifest/manifest"))
    assert(spark.read.parquet(listed(dir, m1): _*).count() == 2)
    // a replacing commit makes the old listing stale — regenerate picks up
    // ONLY the new snapshot's files
    t.overwrite(df((3L, "c")))
    val m2 = t.generateSymlinkManifest()
    val back = spark.read.parquet(listed(dir, m2): _*)
      .as[(Long, String)].collect().toSet
    assert(back == Set((3L, "c")))
  }

  test("partitioned table: one manifest per hive partition dir") {
    val dir = tmpDir("sym") + "/t"
    val t = CowTable(spark, dir,
      TableConfig("t", Seq("id"), partitionKey = Some("seg")))
    t.create(df((1L, "a"), (2L, "b"), (3L, "a")))
    val rels = t.generateSymlinkManifest()
    assert(rels.size == 2 && rels.forall(_.endsWith("/manifest")))
    assert(rels.exists(_.contains("seg=a")) && rels.exists(_.contains("seg=b")))
    val back = spark.read.option("basePath", dir)
      .parquet(listed(dir, rels): _*)
      .select("id", "seg").as[(Long, String)].collect().toSet
    assert(back == Set((1L, "a"), (2L, "b"), (3L, "a")))
    // a partition emptied by delete must not keep serving its old manifest
    t.delete(Seq(2L).toDF("id"))
    val rels2 = t.generateSymlinkManifest()
    assert(!rels2.exists(_.contains("seg=b")))
    assert(!Files.exists(Paths.get(dir)
      .resolve("_symlink_format_manifest").resolve("seg=b")))
  }

  test("deletion-vectored snapshots are fenced loud") {
    val dir = tmpDir("sym") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id"),
      changeDataFeed = true, deletionVectors = true))
    t.create(df((1L, "a"), (2L, "b")))
    t.delete(Seq(1L).toDF("id"))
    val e = intercept[IllegalArgumentException](t.generateSymlinkManifest())
    assert(e.getMessage.contains("resurrect"))
    t.purgeDeletionVectors()
    val rels = t.generateSymlinkManifest()
    assert(spark.read.parquet(listed(dir, rels): _*)
      .as[(Long, String)].collect().toSet == Set((2L, "b")))
  }
}
