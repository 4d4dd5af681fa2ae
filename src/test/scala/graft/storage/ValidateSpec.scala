package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integrity validation (fsck): a healthy table passes every check; a
  * deleted data file, a deleted DV sidecar, and a duplicated primary key
  * are each detected by exactly their check. */
class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private def checks(t: CowTable): Map[String, (Boolean, String)] =
    t.validate().collect()
      .map(r => r.getString(0) -> ((r.getBoolean(1), r.getString(2)))).toMap

  test("healthy table: every check ok (incl. deletion vectors)") {
    val dir = tmpDir("fsck") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id"),
      changeDataFeed = true, deletionVectors = true))
    t.create((1L to 100L).map(i => (i, s"n$i")).toDF("id", "name"))
    t.delete(Seq(Tuple1(5L)).toDF("id")) // attach a DV sidecar
    val c = checks(t)
    assert(c.keySet == Set("files_exist", "dv_sidecars_exist",
      "row_counts_match", "key_unique"))
    assert(c.values.forall(_._1), s"expected all ok, got $c")
  }

  test("a duplicated primary key (raw append) is detected") {
    val dir = tmpDir("fsck") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id")))
    t.create((1L to 50L).map(i => (i, s"n$i")).toDF("id", "name"))
    // duplicate key via a raw DSv2 append (the path that can violate it)
    Seq((3L, "dup")).toDF("id", "name").write.format("graft")
      .mode("append").save(dir)
    val c = checks(t)
    assert(!c("key_unique")._1 && c("key_unique")._2.contains("3"))
    assert(c("files_exist")._1 && c("row_counts_match")._1)
  }

  test("a lost data file / lost DV sidecar are detected, key check defers") {
    val dir = tmpDir("fsck") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id"),
      changeDataFeed = true, deletionVectors = true))
    t.create((1L to 50L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartition(2))
    t.delete(Seq(Tuple1(7L)).toDF("id"))
    val m = t.manifest(t.currentVersion)
    // delete one data file and the DV sidecar dir behind the manifest
    val victim = m.files.find(_.dvPath.isEmpty).get.path
    java.nio.file.Files.delete(t.root.resolve(victim))
    val dv = m.files.flatMap(_.dvPath).head
    CowTable.deleteRecursively(t.root.resolve(dv))
    val c = checks(t)
    assert(!c("files_exist")._1 && c("files_exist")._2.contains(victim))
    assert(!c("dv_sidecars_exist")._1)
    // the uniqueness scan cannot run over missing files — reported
    // un-validated, never a crash
    assert(!c("key_unique")._1 && c("key_unique")._2.contains("not checked"))
    // surviving files still match their footers (existing files only)
    assert(c("row_counts_match")._1)
  }
}
