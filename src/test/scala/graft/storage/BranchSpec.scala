package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** BRANCHES (Iceberg writable refs) — the write-audit-publish surface:
  * fork isolation in both directions, fast-forward publish exactness and
  * zero-copy linking, the stale-main conflict fence, change-feed netting
  * across a publish (deletion-vector deltas included), and the SQL CALL
  * surface over a branch registered as a full lake table. */
class BranchSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("id", "name")

  private def ino(root: java.nio.file.Path, rel: String): Any =
    java.nio.file.Files.getAttribute(root.resolve(rel), "unix:ino")

  test("branch writes are invisible to main; publish lands them exactly") {
    val dir = tmpDir("branch") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id")))
    t.create((1L to 50L).map(i => (i, s"n$i")).toDF("id", "name"))
    val b = t.createBranch("audit")
    assert(t.branches == Seq("audit") && t.branchForkVersion("audit") == 1)

    // audit-side mutations: main never sees them pre-publish
    val mainBefore = t.read().as[(Long, String)].collect().toSet
    b.upsert(df((1L, "EDITED"), (99L, "new")))
    b.delete(Seq(Tuple1(2L)).toDF("id"))
    assert(t.read().as[(Long, String)].collect().toSet == mainBefore)
    assert(t.currentVersion == 1)

    // main-side reads through the handle API see the branch head
    val head = t.branch("audit").read().as[(Long, String)].collect().toSet
    assert(head == mainBefore - ((1L, "n1")) - ((2L, "n2")) +
      ((1L, "EDITED")) + ((99L, "new")))

    // publish: one commit, exact branch-head content
    val v = t.fastForward("audit")
    assert(v == 2 && t.currentVersion == 2)
    assert(t.read().as[(Long, String)].collect().toSet == head)
    // published NEW files are hard links of the branch's (zero copy);
    // carried files still reference the original main inodes
    val broot = t.root.resolve("_branches").resolve("audit")
    t.manifest(2).files.foreach { e =>
      assert(ino(t.root, e.path) == ino(broot, e.path))
    }
    // branch survives publish; dropping it keeps main intact (hard links)
    t.dropBranch("audit")
    assert(t.branches.isEmpty)
    assert(t.read().as[(Long, String)].collect().toSet == head)
  }

  test("fast-forward fails loud when main advanced past the fork") {
    val dir = tmpDir("branch") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id")))
    t.create(df((1L, "a")))
    val b = t.createBranch("wip")
    b.upsert(df((2L, "branch-side")))
    t.upsert(df((3L, "main-side"))) // main moves: audit is now stale
    val e = intercept[IllegalArgumentException](t.fastForward("wip"))
    assert(e.getMessage.contains("main advanced"))
    // main unaffected; re-fork is the documented path
    assert(t.read().as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (3L, "main-side")))
    t.dropBranch("wip")
    val b2 = t.createBranch("wip")
    b2.upsert(df((2L, "branch-side")))
    assert(t.fastForward("wip") == 3)
    assert(t.read().as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "branch-side"), (3L, "main-side")))
  }

  test("untouched branch publishes as a no-op; guards fail loud") {
    val dir = tmpDir("branch") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id")))
    t.create(df((1L, "a")))
    t.createBranch("idle")
    assert(t.fastForward("idle") == 1 && t.currentVersion == 1)
    intercept[IllegalArgumentException](t.createBranch("idle"))
    intercept[IllegalArgumentException](t.branch("ghost"))
    intercept[IllegalArgumentException](t.fastForward("ghost"))
    intercept[IllegalArgumentException](t.dropBranch("ghost"))
    intercept[IllegalArgumentException](t.createBranch("bad/name"))
  }

  test("change feed nets a publish; DV deltas on shared files included") {
    val dir = tmpDir("branch") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id"),
      changeDataFeed = true, deletionVectors = true))
    t.create((1L to 20L).map(i => (i, s"n$i")).toDF("id", "name"))
    val b = t.createBranch("cdc")
    // DV delete on a SHARED file: the branch writes only a sidecar, the
    // linked data file's bytes never change — publish must still surface
    // the tombstones ((path, dvPath, dvRows) entry identity in the feed)
    b.delete(Seq(Tuple1(5L), Tuple1(6L)).toDF("id"))
    b.upsert(df((1L, "EDITED"), (99L, "new")))
    val v = t.fastForward("cdc")
    val feed = t.readChangeFeed(1, v)
      .select($"id", $"name", $"_change_type")
      .as[(Long, String, String)].collect().toSet
    assert(feed.contains((5L, "n5", "delete")))
    assert(feed.contains((6L, "n6", "delete")))
    assert(feed.contains((99L, "new", "insert")))
    assert(feed.contains((1L, "n1", "update_preimage")))
    assert(feed.contains((1L, "EDITED", "update_postimage")))
    // no resurrect / no loss: current state is the branch head
    assert(t.read().as[(Long, String)].collect().toSet ==
      ((1L to 20L).map(i => (i, s"n$i")).toSet
        - ((1L, "n1")) - ((5L, "n5")) - ((6L, "n6"))
        + ((1L, "EDITED")) + ((99L, "new"))))
  }

  test("branch that re-partitioned cannot fast-forward") {
    val dir = tmpDir("branch") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id")))
    t.create(df((1L, "a")))
    val b = t.createBranch("repart")
    b.alterPartitionKey(Some("name"))
    val e = intercept[IllegalArgumentException](t.fastForward("repart"))
    assert(e.getMessage.contains("partition layout"))
  }

  test("SQL surface: CALL create_branch / fast_forward / drop_branch") {
    val lake = tmpDir("branch")
    val t = CowTable(spark, lake + "/events",
      TableConfig("events", Seq("id")))
    t.create(df((1L, "a"), (2L, "b")))
    LakeRegistry.register(lake, t.config, "events")
    val sess = spark.newSession()
    sess.conf.set("spark.sql.catalog.blake", "graft.sources.GraftCatalog")
    sess.conf.set("spark.sql.catalog.blake.warehouse", lake)
    assert(sess.sql("CALL blake.create_branch('events', 'audit')")
      .collect().head.getInt(0) == 1)
    // the branch is a FULL lake table: SQL row-level ops run on it
    sess.sql("""MERGE INTO blake.default.events_branch_audit tgt
      |USING (SELECT 2L AS id, 'B2' AS name UNION ALL
      |       SELECT 9L, 'nine') src
      |ON tgt.id = src.id
      |WHEN MATCHED THEN UPDATE SET *
      |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    sess.sql("DELETE FROM blake.default.events_branch_audit WHERE id = 1")
    // main still serves the audited snapshot
    assert(sess.sql("SELECT * FROM blake.default.events")
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    assert(sess.sql("CALL blake.list_branches('events')")
      .as[(String, Int)].collect().toSet == Set(("audit", 1)))
    assert(sess.sql("CALL blake.fast_forward('events', 'audit')")
      .collect().head.getInt(0) == 2)
    assert(sess.sql("SELECT * FROM blake.default.events")
      .as[(Long, String)].collect().toSet ==
      Set((2L, "B2"), (9L, "nine")))
    assert(sess.sql("CALL blake.drop_branch('events', 'audit')")
      .collect().head.getInt(0) == 2)
    assert(sess.sql("CALL blake.list_branches('events')").count() == 0)
    // the registration went with it
    intercept[Exception](
      sess.sql("SELECT * FROM blake.default.events_branch_audit").collect())
  }
}
