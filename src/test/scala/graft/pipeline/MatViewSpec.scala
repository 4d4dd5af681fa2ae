package graft.pipeline

import graft.SparkSpec
import graft.storage.{CowTable, TableConfig}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MatViewSpec extends SparkSpec {
  import spark.implicits._

  private def rows(r: (Long, String, Double)*): DataFrame =
    r.toSeq.toDF("id", "grp", "v")

  private def mkBase(dir: String, df: DataFrame): CowTable = {
    val t = CowTable(spark, dir + "/base",
      TableConfig("base", Seq("id")))
    t.create(df)
    t
  }

  /** Recompute from the base's CURRENT snapshot — the MV's ground truth. */
  private def recompute(base: CowTable): Set[(String, Long, BigDecimal)] =
    base.read().groupBy("grp")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("v").cast("decimal(28,10)")).as("sum_v"))
      .as[(String, Long, BigDecimal)].collect().toSet

  private def view(mv: MatView): Set[(String, Long, BigDecimal)] =
    mv.read().as[(String, Long, BigDecimal)].collect().toSet

  test("bootstrap refresh equals a full recompute") {
    val dir = tmpDir("mv")
    val base = mkBase(dir, rows((1, "a", 1.5), (2, "a", 2.5), (3, "b", 4.0)))
    val mv = MatView(spark, dir + "/mv", base, Seq("grp"), Seq("v"))
    assert(mv.refresh() == 1)
    assert(view(mv) == recompute(base))
    assert(mv.refresh() == 0) // idempotent no-op
  }

  test("upserts and deletes apply as signed deltas, bit-equal to recompute") {
    val dir = tmpDir("mv")
    val base = mkBase(dir, rows(
      (1, "a", 1.5), (2, "a", 2.5), (3, "b", 4.0), (4, "c", 8.0)))
    val mv = MatView(spark, dir + "/mv", base, Seq("grp"), Seq("v"))
    mv.refresh()
    // update moves a row BETWEEN groups; insert adds a new group member
    base.upsert(rows((2, "b", 3.0), (5, "a", 10.0)))
    base.delete(Seq(4L).toDF("id"))
    assert(mv.refresh() == 2)
    assert(view(mv) == recompute(base))
    // group c vanished entirely (count reached 0 → row deleted, not zeroed)
    assert(!view(mv).exists(_._1 == "c"))
  }

  test("many small refreshes equal one big one (exact decimal state)") {
    val dir = tmpDir("mv")
    val base = mkBase(dir, rows((1, "a", 0.1), (2, "b", 0.2)))
    val mv = MatView(spark, dir + "/mv", base, Seq("grp"), Seq("v"))
    mv.refresh()
    for (i <- 3 to 12) {
      base.upsert(rows((i.toLong, if (i % 2 == 0) "a" else "b", i * 0.1)))
      mv.refresh() // one refresh per commit
    }
    assert(view(mv) == recompute(base))
  }

  test("crash between MV commit and bookmark heals by rollback + replay") {
    val dir = tmpDir("mv")
    val base = mkBase(dir, rows((1, "a", 1.0), (2, "b", 2.0)))
    val mv = MatView(spark, dir + "/mv", base, Seq("grp"), Seq("v"))
    mv.refresh()
    val bookmark = java.nio.file.Paths.get(dir + "/mv/_mv_bookmark")
    val saved = java.nio.file.Files.readString(bookmark)
    base.upsert(rows((3, "a", 3.0)))
    mv.refresh()
    // simulate the crash window: the MV commit landed, the bookmark didn't
    java.nio.file.Files.writeString(bookmark, saved)
    base.upsert(rows((4, "b", 4.0)))
    assert(mv.refresh() == 2) // replays BOTH base versions after healing
    assert(view(mv) == recompute(base))
  }

  test("bootstrap-crash heal keeps the durable definition intact") {
    val dir = tmpDir("mvheal")
    val base = mkBase(dir, rows((1, "a", 1.0), (2, "b", 2.0)))
    // hand-write a definition into the view root, as createInLake does
    val root = java.nio.file.Paths.get(dir + "/mv")
    java.nio.file.Files.createDirectories(root)
    java.nio.file.Files.writeString(root.resolve("_mv_def.json"),
      """{"base":"base","groupCols":["grp"],"sumCols":["v"]}""")
    val mv = MatView(spark, dir + "/mv", base, Seq("grp"), Seq("v"))
    mv.refresh()
    // simulate a bootstrap crash: the MV table committed, bookmark never did
    java.nio.file.Files.delete(root.resolve("_mv_bookmark"))
    val healed = MatView(spark, dir + "/mv", base, Seq("grp"), Seq("v"))
    assert(healed.refresh() == 1) // wipes the half-born view, re-bootstraps
    assert(view(healed) == recompute(base))
    // the definition survived the heal wipe — openInLake stays possible
    assert(java.nio.file.Files.exists(root.resolve("_mv_def.json")))
  }

  test("MV over a deletion-vector base: MOR deltas apply exactly") {
    val dir = tmpDir("mv")
    val base = CowTable(spark, dir + "/base",
      TableConfig("base", Seq("id"),
        changeDataFeed = true, deletionVectors = true))
    base.create(rows((1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)))
    val mv = MatView(spark, dir + "/mv", base, Seq("grp"), Seq("v"))
    mv.refresh()
    base.delete(Seq(2L).toDF("id")) // DV delete: tombstones from the sidecar commit
    base.upsert(rows((3, "a", 9.0), (4, "b", 4.0))) // MOR upsert: marked + appended
    mv.refresh()
    assert(view(mv) == recompute(base))
  }

  test("min/max maintenance: inserts fold in, extremum retraction rescans") {
    val dir = tmpDir("mvmm")
    val base = mkBase(dir, rows(
      (1, "a", 5.0), (2, "a", 1.0), (3, "a", 9.0), (4, "b", 4.0)))
    val mv = MatView(spark, dir + "/mv", base, Seq("grp"), Seq("v"),
      minMaxCols = Seq("v"))
    def mm: Map[String, (Double, Double)] = mv.read()
      .select("grp", "min_v", "max_v")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    mv.refresh()
    assert(mm == Map("a" -> (1.0, 9.0), "b" -> (4.0, 4.0)))
    // clean insert: new max folds in incrementally (no extremum retracted)
    base.upsert(rows((5, "a", 12.0)))
    mv.refresh()
    assert(mm == Map("a" -> (1.0, 12.0), "b" -> (4.0, 4.0)))
    // retract the current max of a: dirty group re-aggregates from base
    base.delete(Seq(5L).toDF("id"))
    mv.refresh()
    assert(mm == Map("a" -> (1.0, 9.0), "b" -> (4.0, 4.0)))
    // update that MOVES the min between groups: both sides stay exact
    base.upsert(rows((2, "b", 0.5)))
    mv.refresh()
    assert(mm == Map("a" -> (5.0, 9.0), "b" -> (0.5, 4.0)))
  }

  test("min/max: insert-then-delete of a would-be extremum in ONE batch") {
    val dir = tmpDir("mvmm2")
    val base = mkBase(dir, rows((1, "a", 5.0), (2, "a", 7.0)))
    val mv = MatView(spark, dir + "/mv", base, Seq("grp"), Seq("v"),
      minMaxCols = Seq("v"))
    mv.refresh()
    // two base commits, ONE refresh: 99.0 enters and leaves inside the
    // applied feed range — folding it in as the max would be wrong
    base.upsert(rows((3, "a", 99.0)))
    base.delete(Seq(3L).toDF("id"))
    assert(mv.refresh() == 2)
    val got = mv.read().select("grp", "min_v", "max_v")
      .as[(String, Double, Double)].head()
    assert(got == ("a", 5.0, 7.0))
  }

  test("min/max state always equals a full recompute through churn") {
    val dir = tmpDir("mvmm3")
    val base = mkBase(dir, (1L to 30L).map(i =>
      (i, s"g${i % 4}", (i * 7 % 13).toDouble)).toDF("id", "grp", "v"))
    val mv = MatView(spark, dir + "/mv", base, Seq("grp"), Seq("v"),
      minMaxCols = Seq("v"))
    mv.refresh()
    val muts = Seq(
      () => base.delete(Seq(13L, 26L).toDF("id")), // 13*7%13=0: a min dies
      () => base.upsert(rows((31, "g1", -4.0), (7, "g2", 50.0))),
      () => base.delete(Seq(31L).toDF("id")), // retract the fresh min
      () => base.upsert(rows((8, "g0", 2.0), (9, "g3", 2.0))))
    muts.foreach { m =>
      m(); mv.refresh()
      val got = mv.read()
        .select("grp", "n_rows", "min_v", "max_v")
        .as[(String, Long, Double, Double)].collect().toSet
      val want = base.read().groupBy("grp")
        .agg(count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"))
        .as[(String, Long, Double, Double)].collect().toSet
      assert(got == want)
    }
  }

  test("lake catalog round-trip carries minMaxCols through the definition") {
    val dir = tmpDir("mvmmlake")
    val base = CowTable(spark, dir + "/b",
      graft.storage.TableConfig("b", Seq("id")))
    base.create(rows((1, "a", 3.0), (2, "b", 4.0)))
    graft.storage.LakeRegistry.register(dir, base.config, dir + "/b")
    MatView.createInLake(spark, dir, "mvx", "b", Seq("grp"), Seq("v"),
      minMaxCols = Seq("v"))
    base.upsert(rows((3, "a", -1.0)))
    val reopened = MatView.openInLake(spark, dir, "mvx")
    reopened.refresh()
    assert(reopened.read().select("grp", "min_v")
      .as[(String, Double)].collect().toMap == Map("a" -> -1.0, "b" -> 4.0))
  }

  test("multiple group columns and multiple measures") {
    val dir = tmpDir("mv")
    val df = Seq((1L, "a", "x", 1.0, 10.0), (2L, "a", "y", 2.0, 20.0),
      (3L, "a", "x", 4.0, 40.0))
      .toDF("id", "g1", "g2", "v1", "v2")
    val base = CowTable(spark, dir + "/base", TableConfig("base", Seq("id")))
    base.create(df)
    val mv = MatView(spark, dir + "/mv", base, Seq("g1", "g2"),
      Seq("v1", "v2"))
    mv.refresh()
    val got = mv.read().as[(String, String, Long, BigDecimal, BigDecimal)]
      .collect().toSet
    assert(got == Set(
      ("a", "x", 2L, BigDecimal("5.0000000000"), BigDecimal("50.0000000000")),
      ("a", "y", 1L, BigDecimal("2.0000000000"),
        BigDecimal("20.0000000000"))))
  }
}
