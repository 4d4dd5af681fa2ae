package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(name: String, clustered: Boolean = false): CowTable = {
    val rows = (1L to 100L).map(i => (i, s"v$i", i * 10)).toDF("k", "s", "n")
    CowTable.replace(spark, tmpDir(name) + "/t",
      TableConfig("diff_spec", Seq("k"), clusterByKey = clustered),
      if (clustered) rows.repartition(8) else rows.repartition(4))
  }

  private def diff(t: CowTable, v1: Int, v2: Int): Map[Long, String] =
    t.diffSnapshots(v1, v2).as[(Long, String)].collect().toMap

  test("added / removed / changed classified; verbatim neighbors silent") {
    val t = mkTable("sd-basic")
    t.upsert(Seq((3L, "CHANGED", 30L)).toDF("k", "s", "n"))
    t.upsert(Seq((200L, "new", 0L)).toDF("k", "s", "n"))
    t.delete(Seq(Tuple1(7L)).toDF("k"))
    val d = diff(t, 1, t.currentVersion)
    // every other key rode along in rewritten files but compares equal
    assert(d == Map(3L -> "changed", 200L -> "added", 7L -> "removed"), d)
  }

  test("diff of a version with itself, and across a pure compaction, " +
    "is empty") {
    val t = mkTable("sd-noop")
    assert(diff(t, 1, 1).isEmpty)
    t.compact(smallBytes = Long.MaxValue, targetPartitions = 1)
    // compaction rewrote every file but no row content changed
    assert(diff(t, 1, t.currentVersion).isEmpty)
    // ...even though the file sets are entirely different
    val (only1, only2) = t.diffFileSets(1, t.currentVersion)
    assert(only1.nonEmpty && only2.nonEmpty)
  }

  test("O(changed-files): a narrow-range upsert on a clustered table " +
    "diffs a strict file subset") {
    val t = mkTable("sd-prune", clustered = true)
    val total = t.manifest(1).files.size
    t.upsert(Seq((5L, "touch", 50L)).toDF("k", "s", "n"))
    val (only1, only2) = t.diffFileSets(1, t.currentVersion)
    assert(only1.size < total,
      s"diff read ${only1.size} of $total v1 files — no pruning")
    assert(only2.nonEmpty)
    assert(diff(t, 1, t.currentVersion) == Map(5L -> "changed"))
  }

  test("diff is directional: reversing versions swaps added/removed") {
    val t = mkTable("sd-dir")
    t.upsert(Seq((300L, "x", 1L)).toDF("k", "s", "n"))
    assert(diff(t, 1, 2) == Map(300L -> "added"))
    assert(diff(t, 2, 1) == Map(300L -> "removed"))
  }

  test("schema evolution: an evolved-in non-null column reads as changed") {
    val t = mkTable("sd-evolve")
    t.upsert(Seq((1L, "v1", 10L, "extra")).toDF("k", "s", "n", "tag"))
    val d = diff(t, 1, t.currentVersion)
    assert(d(1L) == "changed")
    // rows whose files were rewritten but whose evolved column is null
    // compare equal to their v1 null-filled image and stay silent
    assert(!d.contains(2L))
  }

  test("bad versions fail loud") {
    val t = mkTable("sd-bad")
    intercept[IllegalArgumentException] { t.diffSnapshots(0, 1) }
    intercept[IllegalArgumentException] { t.diffSnapshots(1, 99) }
  }
}
