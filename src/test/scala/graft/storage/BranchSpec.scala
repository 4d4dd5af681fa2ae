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

  test("OPTIMIZE on a branch: publish carries the clustered files") {
    val dir = tmpDir("branch") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id")))
    t.create((1L to 400L).map(i => (i, s"n$i")).toDF("id", "name")
      .repartition(4))
    val b = t.createBranch("maint")
    b.optimize() // z-order the BRANCH — main must stay untouched
    val bHead = b.manifest(b.currentVersion)
    assert(bHead.files.nonEmpty && bHead.files.forall(
      _.zorderBy.contains("id")))
    assert(t.currentVersion == 1 &&
      t.manifest(1).files.forall(_.zorderBy.isEmpty))
    // publish: the clustered files (and their signatures) land on main
    val v = t.fastForward("maint")
    val mHead = t.manifest(v)
    assert(mHead.files.map(_.path).toSet == bHead.files.map(_.path).toSet)
    assert(mHead.files.forall(_.zorderBy.contains("id")))
    assert(t.read().as[(Long, String)].collect().toSet ==
      (1L to 400L).map(i => (i, s"n$i")).toSet)
    // signatures survived the publish: incremental OPTIMIZE on main
    // recognizes the branch's work and is a commit-free no-op
    assert(t.optimize() == v && t.currentVersion == v)
  }

  test("matview + WAP: one refresh absorbs a branch publish; branch base " +
      "fails loud after drop") {
    val lake = tmpDir("branchmv")
    val t = CowTable(spark, lake + "/base",
      TableConfig("base", Seq("id"), changeDataFeed = true))
    t.create(Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
      .toDF("id", "grp", "v"))
    val mv = graft.pipeline.MatView(
      spark, lake + "/mv", t, Seq("grp"), Seq("v"))
    mv.refresh()
    // the documented pattern: MV on MAIN, mutations audited on a branch —
    // the MV cannot see un-published work…
    val b = t.createBranch("wap")
    b.upsert(Seq((1L, "a", 11.0), (4L, "b", 40.0)).toDF("id", "grp", "v"))
    b.delete(Seq(Tuple1(2L)).toDF("id"))
    assert(mv.refresh() == 0) // main unchanged: nothing to do
    // …and the publish's netted change feed drives ONE exact refresh
    t.fastForward("wap")
    assert(mv.refresh() == 1)
    assert(mv.read()
      .select($"grp", $"n_rows", $"sum_v".cast("double"))
      .as[(String, Long, Double)].collect().toSet ==
      Set(("a", 1L, 11.0), ("b", 2L, 70.0)))
    // a matview built directly against a BRANCH handle works while the
    // branch lives, but dies WITH the branch — loud, not silently stale
    val b2 = t.createBranch("wap2")
    val mvB = graft.pipeline.MatView(
      spark, lake + "/mv_branch", b2, Seq("grp"), Seq("v"))
    mvB.refresh()
    b2.upsert(Seq((5L, "c", 50.0)).toDF("id", "grp", "v"))
    assert(mvB.refresh() == 1)
    t.dropBranch("wap2")
    intercept[Exception](t.branch("wap2")) // handle re-open fails…
    // …and a stale handle's refresh must FAIL, not silently no-op (a
    // 0-change return would be invisible staleness)
    val stale = scala.util.Try(mvB.refresh())
    assert(stale.isFailure,
      s"refresh on a dropped branch must fail loud, got $stale")
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
