package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** COLUMN MAPPING (Delta name-mapping analog): RENAME/DROP COLUMN are
  * metadata-only — physical file names never change, the manifest's
  * logical→physical mapping absorbs the divergence, and a re-added column
  * can never resurrect a dropped predecessor's bytes. */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def mk(dir: String, cfg: TableConfig = TableConfig("t", Seq("id")))
      : CowTable = {
    val t = CowTable(spark, dir + "/t", cfg)
    t.create((1L to 50L).map(i => (i, s"v$i", i * 10)).toDF("id", "v", "amt"))
    t
  }

  test("rename is metadata-only: same files, new logical name, old data") {
    val dir = tmpDir("cmap")
    val t = mk(dir)
    val filesBefore = t.manifest(1).files.map(_.path).toSet
    val v = t.renameColumn("v", "payload")
    assert(v == 2)
    val m = t.manifest(2)
    // zero data rewritten: the commit carries the IDENTICAL file set
    assert(m.files.map(_.path).toSet == filesBefore)
    assert(m.columnMapping == Map("payload" -> "v"))
    assert(!m.dataChange) // feed/stream consumers skip it
    val got = t.read().select("id", "payload")
      .as[(Long, String)].collect().toMap
    assert(got(7L) == "v7" && got.size == 50)
    // time travel BELOW the rename shows the old name (that version's schema)
    assert(t.readVersion(1).columns.toSeq == Seq("id", "v", "amt"))
  }

  test("writes after a rename keep the stable physical name") {
    val dir = tmpDir("cmap")
    val t = mk(dir)
    t.renameColumn("v", "payload")
    t.upsert(Seq((7L, "NEW", 70L), (99L, "v99", 990L))
      .toDF("id", "payload", "amt"))
    val got = t.read().select("id", "payload")
      .as[(Long, String)].collect().toMap
    assert(got(7L) == "NEW" && got(99L) == "v99" && got(8L) == "v8")
    // the post-rename files physically store the ORIGINAL column name —
    // that is the invariant that kept the rename free
    val prior = t.manifest(2).files.map(_.path).toSet
    val newFiles = t.manifest(3).files.filterNot(e => prior(e.path))
    assert(newFiles.nonEmpty)
    val raw = spark.read.parquet(
      newFiles.map(e => dir + "/t/" + e.path): _*)
    assert(raw.columns.contains("v") && !raw.columns.contains("payload"))
    // compaction round-trips through logical names and back
    t.compact(smallBytes = 1L << 30, targetPartitions = 1)
    assert(t.read().select("id", "payload").as[(Long, String)]
      .collect().toMap.apply(7L) == "NEW")
  }

  test("drop hides the column; re-add gets a FRESH slot — no resurrection") {
    val dir = tmpDir("cmap")
    val t = mk(dir)
    t.dropColumn("v")
    assert(t.read().columns.toSeq == Seq("id", "amt"))
    // upsert re-introduces a column NAMED v (schema-merge-on-write): the
    // burned physical slot forces a fresh one — old files' v-bytes stay dead
    t.upsert(Seq((1L, 10L, "fresh1"), (99L, 990L, "fresh99"))
      .toDF("id", "amt", "v"))
    val m = t.manifest(t.currentVersion)
    assert(m.columnMapping.get("v").exists(_ != "v"), m.columnMapping)
    assert(m.usedPhysicalNames.contains("v"))
    val got = t.read().select("id", "v").as[(Long, Option[String])]
      .collect().toMap
    assert(got(1L).contains("fresh1") && got(99L).contains("fresh99"))
    // rows untouched by the re-add read NULL — never the dropped bytes
    assert(got(2L).isEmpty, got(2L))
  }

  test("rename after drop may reuse the name logically, never physically") {
    val dir = tmpDir("cmap")
    val t = mk(dir)
    t.dropColumn("v")                    // v's physical slot burns
    t.renameColumn("amt", "v")           // logical reuse is fine
    val m = t.manifest(3)
    assert(m.columnMapping == Map("v" -> "amt"))
    val got = t.read().select("id", "v").as[(Long, Long)].collect().toMap
    assert(got(3L) == 30L) // amt's data, NOT the dropped v's
  }

  test("structural and constraint-referenced columns are fenced") {
    val dir = tmpDir("cmap")
    val t = CowTable(spark, dir + "/t",
      TableConfig("t", Seq("id"), partitionKey = Some("p"),
        checkConstraints = Seq("amt >= 0")))
    t.create(Seq((1L, "a", 5L), (2L, "b", 6L)).toDF("id", "p", "amt"))
    intercept[IllegalArgumentException](t.renameColumn("id", "key"))
    intercept[IllegalArgumentException](t.dropColumn("p"))
    intercept[IllegalArgumentException](t.renameColumn("amt", "total"))
    intercept[IllegalArgumentException](t.dropColumn("amt"))
    intercept[IllegalArgumentException](t.renameColumn("p", "_change_type"))
    intercept[IllegalArgumentException](t.dropColumn("nope"))
  }

  test("change feed resolves physical change files across a rename") {
    val dir = tmpDir("cmap")
    val t = CowTable(spark, dir + "/t",
      TableConfig("t", Seq("id"), changeDataFeed = true))
    t.create((1L to 20L).map(i => (i, s"v$i")).toDF("id", "v"))
    t.upsert(Seq((5L, "V5"), (21L, "v21")).toDF("id", "v"))  // v2: _cdc files
    t.renameColumn("v", "payload")                           // v3: metadata
    t.upsert(Seq((6L, "V6")).toDF("id", "payload"))          // v4: _cdc files
    val feed = t.readChangeFeed(1, 4)
      .select("id", "payload", "_commit_version", "_change_type")
      .as[(Long, String, Int, String)].collect().toSet
    // pre-rename change rows surface under the NEW logical name with their
    // values intact (physical names are stable), post-rename rows likewise
    assert(feed.contains((5L, "V5", 2, "update_postimage")), feed)
    assert(feed.contains((21L, "v21", 2, "insert")), feed)
    assert(feed.contains((6L, "V6", 4, "update_postimage")), feed)
    assert(!feed.exists(_._3 == 3), feed) // the rename commit emits nothing
  }

  test("clone carries the mapping; statsColumns follow a rename") {
    val dir = tmpDir("cmap")
    val t = CowTable(spark, dir + "/t",
      TableConfig("t", Seq("id"), statsColumns = Seq("amt")))
    t.create((1L to 50L).map(i => (i, s"v$i", i * 10)).toDF("id", "v", "amt"))
    t.renameColumn("amt", "total")
    val m = t.manifest(2)
    assert(m.statsColumns == Seq("total"))
    // per-file extra stats stay keyed by the PHYSICAL name — pre-rename
    // files keep skipping after the rename
    assert(m.files.forall(_.extra.contains("amt")))
    val c = t.shallowClone(dir + "/clone")
    val cm = c.manifest(1)
    assert(cm.columnMapping == Map("total" -> "amt"))
    assert(c.read().select("id", "total").as[(Long, Long)]
      .collect().toMap.apply(4L) == 40L)
  }
}
