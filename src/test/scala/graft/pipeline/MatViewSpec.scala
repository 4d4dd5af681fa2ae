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
