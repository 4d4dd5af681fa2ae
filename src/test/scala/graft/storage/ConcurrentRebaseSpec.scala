package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshot-isolation rebase for row-level commits: a writer whose
  * snapshot went stale mid-merge re-commits WITHOUT re-reading or
  * re-writing data when the winners are provably disjoint (manifest-only
  * proof), and keeps the loud [[ConcurrentWriteException]] whenever
  * disjointness can't be shown. `upsertFrom`/`deleteFrom` pin the stale
  * snapshot the way a slow cluster-side writer would hold one. */
class ConcurrentRebaseSpec extends SparkSpec {
  import spark.implicits._

  private def mk(dir: String, cfg: TableConfig = TableConfig("t", Seq("id")))
      : CowTable = {
    val t = CowTable(spark, dir + "/t", cfg)
    // four range-disjoint files so per-file key stats can prove disjointness
    t.create((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(4, $"id"))
    t
  }

  test("disjoint concurrent upserts: the stale writer rebases, both land") {
    val t = mk(tmpDir("rb"))
    val v1 = t.currentVersion
    t.upsert(Seq((98L, "B98"), (99L, "B99")).toDF("id", "v")) // winner: v2
    val v = t.upsertFrom(v1, Seq((1L, "A1"), (2L, "A2")).toDF("id", "v"))
    assert(v == 3, "stale writer must land as v3 via rebase")
    val got = t.read().as[(Long, String)].collect().toMap
    assert(got(1L) == "A1" && got(2L) == "A2")
    assert(got(98L) == "B98" && got(99L) == "B99")
    assert(got(50L) == "v50" && got.size == 100)
  }

  test("rebase chains across several winners") {
    val t = mk(tmpDir("rb"))
    val v1 = t.currentVersion
    t.upsert(Seq((98L, "B98")).toDF("id", "v"))            // v2
    t.upsert(Seq((97L, "C97")).toDF("id", "v"))            // v3
    val v = t.upsertFrom(v1, Seq((2L, "A2")).toDF("id", "v"))
    assert(v == 4)
    val got = t.read().as[(Long, String)].collect().toMap
    assert(got(2L) == "A2" && got(97L) == "C97" && got(98L) == "B98")
  }

  test("overlapping file rewrite fails loud (stale read)") {
    val t = mk(tmpDir("rb"))
    val v1 = t.currentVersion
    t.upsert(Seq((2L, "B2")).toDF("id", "v")) // winner rewrites A's file
    val e = intercept[ConcurrentWriteException] {
      t.upsertFrom(v1, Seq((1L, "A1")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("rewrote file"), e.getMessage)
    // nothing half-landed: the winner's row is intact, A's row unchanged
    val got = t.read().as[(Long, String)].collect().toMap
    assert(got(2L) == "B2" && got(1L) == "v1")
  }

  test("same NEW key inserted by both writers fails loud (no dup key)") {
    val t = mk(tmpDir("rb"))
    val v1 = t.currentVersion
    t.upsert(Seq((500L, "B500")).toDF("id", "v")) // brand-new key, new file
    val e = intercept[ConcurrentWriteException] {
      t.upsertFrom(v1, Seq((500L, "A500")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("may contain"), e.getMessage)
    assert(t.read().filter($"id" === 500L).count() == 1)
  }

  test("disjoint NEW keys from both writers rebase cleanly") {
    val t = mk(tmpDir("rb"))
    val v1 = t.currentVersion
    t.upsert(Seq((500L, "B500")).toDF("id", "v"))
    val v = t.upsertFrom(v1, Seq((900L, "A900")).toDF("id", "v"))
    assert(v == 3)
    val got = t.read().as[(Long, String)].collect().toMap
    assert(got(500L) == "B500" && got(900L) == "A900" && got.size == 102)
  }

  test("concurrent schema change blocks the rebase") {
    val t = mk(tmpDir("rb"))
    val v1 = t.currentVersion
    // winner evolves the schema (adds a column via schema-merging upsert)
    t.upsert(Seq((98L, "B98", 1L)).toDF("id", "v", "extra"))
    val e = intercept[ConcurrentWriteException] {
      t.upsertFrom(v1, Seq((1L, "A1")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("schema"), e.getMessage)
  }

  test("delete rebases over a disjoint upsert; CDF rows carry the " +
    "rebased version") {
    val dir = tmpDir("rb")
    val t = CowTable(spark, dir + "/t",
      TableConfig("t", Seq("id"), changeDataFeed = true))
    t.create((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(4, $"id"))
    val v1 = t.currentVersion
    t.upsert(Seq((99L, "B99")).toDF("id", "v"))                // v2
    val v = t.deleteFrom(v1, Seq(Tuple1(2L)).toDF("id"))       // rebased v3
    assert(v == 3)
    assert(t.read().filter($"id" === 2L).count() == 0)
    assert(t.read().filter($"id" === 99L).as[(Long, String)].head()._2
      == "B99")
    val feed = t.readChangeFeed(2, 3)
      .select("id", "_change_type", "_commit_version")
      .as[(Long, String, Int)].collect().toSet
    assert(feed == Set((2L, "delete", 3)), feed)
  }

  test("footprint (row-level SQL path) rebase: disjoint winner carried, " +
    "range overlap fails loud") {
    val t = mk(tmpDir("rb"))
    val m1 = t.manifest(1)
    val schema = CowTable.structFromJson(m1.schemaJson)
    val f0 = m1.files.minBy(_.minKey.get.toLong) // keys 1..25
    // winner rewrites the LAST file (keys 76..100) — disjoint from f0
    t.upsert(Seq((99L, "B99")).toDF("id", "v"))  // v2
    // loser simulates a SQL MERGE that rewrote only f0 (here: "rewrote" it
    // to itself — commit mechanics are what's under test), footprint = f0
    val v = t.commitRowLevelRebased(1, Seq(f0),
      m1.files.filterNot(_ eq f0), schema, Set(f0.path), Seq(f0))
    assert(v == 3)
    val got = t.read().as[(Long, String)].collect().toMap
    assert(got(99L) == "B99" && got(1L) == "v1" && got.size == 100)

    // a winner whose ADDED file's range intersects the footprint blocks it:
    // manifest-level winner adding stats [10,10] under a NEW path (the
    // rebase must fail before any read, so the path never resolves)
    val m3 = t.manifest(3)
    t.commitAt(3, Seq(f0.copy(path = "vfake/part-0.parquet",
      minKey = Some("10"), maxKey = Some("10"))), m3.files, schema) // v4
    val e = intercept[ConcurrentWriteException] {
      t.commitRowLevelRebased(3, Seq(f0), m3.files.filterNot(_ eq f0),
        schema, Set(f0.path), Seq(f0))
    }
    assert(e.getMessage.contains("may contain"), e.getMessage)
  }

  // ---------------------------------------------------------------------
  // CONFLICT MATRIX cells (README "Concurrency conflict matrix" documents
  // the full table; branch-publish ∥ base-write lives in BranchSpec).
  // ---------------------------------------------------------------------

  test("matrix: SQL MERGE ∥ SQL MERGE on disjoint keys — both land " +
      "(footprint rebase), any interleaving") {
    val dir = tmpDir("rb") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id"),
      clusterByKey = true))
    t.create((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(4, $"id"))
    Seq((1L, "A1"), (2L, "A2")).toDF("id", "v")
      .createOrReplaceTempView("rb_mm_a")
    Seq((99L, "B99"), (101L, "B101")).toDF("id", "v")
      .createOrReplaceTempView("rb_mm_b")
    spark.sql("DROP TABLE IF EXISTS rb_mm")
    spark.sql(s"CREATE TABLE rb_mm USING graft LOCATION '$dir'")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val gate = new java.util.concurrent.CountDownLatch(2)
    def merge(view: String): java.util.concurrent.Future[_] =
      pool.submit(new Runnable {
        def run(): Unit = {
          gate.countDown(); gate.await()
          spark.sql(s"MERGE INTO rb_mm t USING $view s ON t.id = s.id " +
            "WHEN MATCHED THEN UPDATE SET * " +
            "WHEN NOT MATCHED THEN INSERT *")
        }
      })
    try {
      val (fa, fb) = (merge("rb_mm_a"), merge("rb_mm_b"))
      fa.get(180, java.util.concurrent.TimeUnit.SECONDS)
      fb.get(180, java.util.concurrent.TimeUnit.SECONDS)
    } finally {
      pool.shutdown()
      spark.sql("DROP TABLE IF EXISTS rb_mm")
    }
    assert(t.currentVersion == 3, "both statements must commit")
    val got = t.read().as[(Long, String)].collect().toMap
    assert(got.size == 101)
    assert(got(1L) == "A1" && got(2L) == "A2")
    assert(got(99L) == "B99" && got(101L) == "B101")
    assert(got(50L) == "v50")
  }

  test("matrix: blind append rebases over a compaction winner; the " +
      "compacted layout is carried") {
    val t = mk(tmpDir("rb"))
    val v1 = t.currentVersion
    assert(t.compact(targetPartitions = 1) == 2) // reorg winner: folds 4→1
    val binned = t.manifest(2).files.map(_.path).toSet
    // stale pure-insert batch pinned at v1: provably disjoint from every
    // file the compaction rewrote — rebases, both land
    val v = t.upsertFrom(v1,
      Seq((200L, "N200"), (201L, "N201")).toDF("id", "v"))
    assert(v == 3)
    assert(binned.subsetOf(t.manifest(3).files.map(_.path).toSet),
      "the rebase must carry the winner's compacted layout")
    assert(t.read().count() == 102)
    assert(t.read().filter($"id" >= 200L).count() == 2)
  }

  test("matrix: a compaction racing an append loses LOUD; the retry " +
      "folds the appended file too") {
    val t = mk(tmpDir("rb"))
    val m1 = t.manifest(1)
    t.upsert(Seq((200L, "N200")).toDF("id", "v")) // append wins: v2
    // a reorg commit computed against v1 carries no rebase context (a
    // rebased carry would DROP the winner's file): hard CAS failure
    intercept[ConcurrentWriteException] {
      t.commitAt(1, Nil, m1.files,
        CowTable.structFromJson(m1.schemaJson), dataChange = false)
    }
    // retry reads the current head and folds everything, appended row incl.
    assert(t.compact(targetPartitions = 1) == 3)
    assert(t.read().count() == 101)
    assert(t.read().filter($"id" === 200L).count() == 1)
  }

  test("matrix: DV delete ∥ purge — in-place sidecar changes cannot " +
      "rebase, stale writer fails loud, fresh retry lands") {
    val dir = tmpDir("rb")
    val t = CowTable(spark, dir + "/t", TableConfig("t", Seq("id"),
      changeDataFeed = true, deletionVectors = true))
    t.create((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartitionByRange(4, $"id"))
    t.delete(Seq(Tuple1(10L)).toDF("id"))     // v2: sidecar on file 1
    t.purgeDeletionVectors()                  // v3 winner: rewrote that file
    // a DV delete pinned at v2 would point its sidecar at a replaced file
    intercept[ConcurrentWriteException] {
      t.deleteFrom(2, Seq(Tuple1(11L)).toDF("id"))
    }
    // fresh handle sees the purged layout and lands as v4
    t.delete(Seq(Tuple1(11L)).toDF("id"))
    assert(t.currentVersion == 4)
    assert(t.read().count() == 98)
  }

  test("matrix: metadata delete ∥ row-level delete — the pinned parent " +
      "trips the CAS instead of committing stale coverage") {
    val t = mk(tmpDir("rb"))
    val drop = t.manifest(1).files.minBy(_.minKey.get.toLong) // keys 1..25
    t.delete(Seq(Tuple1(50L)).toDF("id")) // row-level winner: v2
    // coverage computed against v1 must NOT publish on top of v2 silently
    intercept[ConcurrentWriteException] {
      t.metadataDeleteFiles(Set(drop.path), expectedParent = Some(1))
    }
    assert(t.currentVersion == 2, "the losing attempt must move nothing")
    // recomputed against the current head (the file survived v2): lands
    assert(t.metadataDeleteFiles(Set(drop.path),
      expectedParent = Some(2)) == 3)
    assert(t.read().count() == 74) // 100 - file[1..25] - key 50
    assert(t.read().filter($"id" <= 25L).count() == 0)
  }

  test("keyRangesOverlap: numeric vs utf8, missing stats conservative") {
    def e(mn: String, mx: String) =
      FileEntry("p", 1L, Some(mn), Some(mx))
    assert(!CowTable.keyRangesOverlap(
      Seq(e("26", "50")), Seq(e("1", "25")), numeric = true))
    assert(CowTable.keyRangesOverlap(
      Seq(e("25", "50")), Seq(e("1", "25")), numeric = true))
    // "9" > "10" as strings: numeric=false must compare as UTF8 text
    assert(!CowTable.keyRangesOverlap(
      Seq(e("a", "b")), Seq(e("c", "d")), numeric = false))
    assert(CowTable.keyRangesOverlap(
      Seq(e("b", "c")), Seq(e("a", "b")), numeric = false))
    // missing stats on either side ⇒ overlap (conservative)
    assert(CowTable.keyRangesOverlap(
      Seq(FileEntry("p", 1L, None, None)), Seq(e("1", "2")), numeric = true))
    assert(CowTable.keyRangesOverlap(
      Seq(e("1", "2")), Seq(FileEntry("p", 1L, None, None)), numeric = true))
    // empty footprint: assume interaction (no proof available)
    assert(CowTable.keyRangesOverlap(Seq(e("1", "2")), Nil, numeric = true))
  }

  test("ops without a rebase context keep the fail-fast contract") {
    val t = mk(tmpDir("rb"))
    val m = t.manifest(t.currentVersion)
    t.upsert(Seq((98L, "B98")).toDF("id", "v")) // bump the head
    // a raw stale commit (no RebaseCtx) must still fail loud
    intercept[ConcurrentWriteException] {
      t.commitAt(1, Nil, m.files,
        CowTable.structFromJson(m.schemaJson), dataChange = false)
    }
  }

  test("matrix: ALTER COLUMN TYPE winner blocks a stale writer's rebase; " +
      "the retry aligns to the widened schema") {
    val dir = tmpDir("rb")
    val sess = spark.newSession()
    sess.conf.set("spark.sql.catalog.lake", "graft.sources.GraftCatalog")
    sess.conf.set("spark.sql.catalog.lake.warehouse", dir)
    sess.sql("CREATE TABLE lake.default.aw (id BIGINT, n INT) " +
      "OPTIONS (primaryKey 'id')")                              // v1
    sess.sql("INSERT INTO lake.default.aw VALUES (1, 10), (2, 20)") // v2
    val t = CowTable(spark, dir + "/aw", TableConfig("aw", Seq("id")))
    // winner: metadata-only widen at v3 — a SCHEMA change, which the
    // rebase contract always treats as blocking (a carried stale file is
    // only provably safe for pure widening; the conservative loud fail +
    // retry keeps one rule for every schema change)
    sess.sql("ALTER TABLE lake.default.aw ALTER COLUMN n TYPE BIGINT")
    intercept[ConcurrentWriteException] {
      t.upsertFrom(2, Seq((100L, 5)).toDF("id", "n"))
    }
    // the retry re-reads the head, auto-widens its INT batch, and lands;
    // pre-widen INT32 files and the new write read under one BIGINT column
    t.upsert(Seq((100L, 5)).toDF("id", "n"))
    val got = sess.sql(
      "SELECT id, n FROM lake.default.aw ORDER BY id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == Seq(1L -> 10L, 2L -> 20L, 100L -> 5L), got.mkString(", "))
  }
}
