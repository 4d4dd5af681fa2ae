package graft.operators

import graft.SparkSpec
import graft.storage.{CowTable, TableConfig}
import org.apache.spark.sql.DataFrame

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  /** (key, change_id, op, ts, payload) change log. */
  private def log(rows: (Long, Long, String, String, String)*): DataFrame =
    rows.toSeq.toDF("k", "change_id", "Op", "ts_s", "payload")
      .selectExpr("k", "change_id", "Op",
        "CAST(ts_s AS TIMESTAMP) AS ts", "payload")

  private def hist(df: DataFrame): Seq[(Long, Long, String, Option[String], Boolean)] =
    Scd2.history(df, Seq("k"), "ts", "Op", Seq("change_id"))
      .selectExpr("k", "change_id", "CAST(valid_from AS STRING)",
        "CAST(valid_to AS STRING)", "is_current")
      .as[(Long, Long, String, Option[String], Boolean)]
      .collect().toSeq.sortBy(r => (r._1, r._2))

  test("intervals chain: each version closed by the next change") {
    val out = hist(log(
      (1L, 1L, "I", "2024-01-01 00:00:00", "a"),
      (1L, 2L, "U", "2024-01-02 00:00:00", "b"),
      (1L, 3L, "U", "2024-01-03 00:00:00", "c")))
    assert(out == Seq(
      (1L, 1L, "2024-01-01 00:00:00", Some("2024-01-02 00:00:00"), false),
      (1L, 2L, "2024-01-02 00:00:00", Some("2024-01-03 00:00:00"), false),
      (1L, 3L, "2024-01-03 00:00:00", None, true)))
  }

  test("delete closes the interval, emits no row, kills is_current") {
    val out = hist(log(
      (1L, 1L, "I", "2024-01-01 00:00:00", "a"),
      (1L, 2L, "D", "2024-01-02 00:00:00", "a"),
      // re-insert after the delete: a NEW current version, with a gap
      (1L, 3L, "I", "2024-01-05 00:00:00", "b")))
    assert(out == Seq(
      (1L, 1L, "2024-01-01 00:00:00", Some("2024-01-02 00:00:00"), false),
      (1L, 3L, "2024-01-05 00:00:00", None, true)))
  }

  test("key whose last event is a delete has no current row") {
    val out = hist(log(
      (1L, 1L, "I", "2024-01-01 00:00:00", "a"),
      (1L, 2L, "D", "2024-01-02 00:00:00", "a")))
    assert(out.forall(!_._5))
  }

  test("same-instant ties order by the tie-break column") {
    val out = hist(log(
      (1L, 2L, "U", "2024-01-01 00:00:00", "b"),
      (1L, 1L, "I", "2024-01-01 00:00:00", "a")))
    assert(out.map(r => (r._2, r._5)) == Seq((1L, false), (2L, true)))
  }

  test("history plan: exactly one key shuffle") {
    val plan = Scd2.history(log((1L, 1L, "I", "2024-01-01 00:00:00", "a")),
        Seq("k"), "ts", "Op", Seq("change_id"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 key shuffle, plan:\n$plan")
  }

  private val fullLog = log(
    (1L, 1L, "I", "2024-01-01 00:00:00", "a"),
    (1L, 2L, "U", "2024-01-03 00:00:00", "b"),
    (1L, 3L, "D", "2024-01-05 00:00:00", "b"),
    (1L, 4L, "I", "2024-01-07 00:00:00", "c"),
    (2L, 5L, "I", "2024-01-02 00:00:00", "x"),
    (2L, 6L, "U", "2024-01-06 00:00:00", "y"),
    (3L, 7L, "I", "2024-01-04 00:00:00", "q"))

  private def applyBatches(dir: String, batches: Seq[DataFrame]): Seq[Row5] = {
    CowTable.deleteRecursively(java.nio.file.Paths.get(dir))
    val tbl = CowTable(spark, dir, TableConfig("scd2", Seq("k", "change_id")))
    batches.foreach(b =>
      Scd2.applyBatch(tbl, b, Seq("k"), "ts", "Op", Seq("change_id")))
    Scd2.historyView(tbl)
      .selectExpr("k", "change_id", "CAST(valid_from AS STRING)",
        "CAST(valid_to AS STRING)", "is_current")
      .as[Row5].collect().toSeq.sortBy(r => (r._1, r._2))
  }
  private type Row5 = (Long, Long, String, Option[String], Boolean)

  test("incremental apply converges to the one-shot history (any split)") {
    val oneShot = hist(fullLog)
    val byTime = applyBatches(tmpDir("scd2a"), Seq(
      fullLog.filter($"ts" < "2024-01-04"),
      fullLog.filter($"ts" >= "2024-01-04")))
    assert(byTime == oneShot)
    // out-of-order: the LATE batch carries the oldest events
    val late = applyBatches(tmpDir("scd2b"), Seq(
      fullLog.filter($"ts" >= "2024-01-04"),
      fullLog.filter($"ts" < "2024-01-04")))
    assert(late == oneShot)
    // three single-key-interleaved batches
    val thirds = applyBatches(tmpDir("scd2c"), Seq(
      fullLog.filter($"change_id" % 3 === 0),
      fullLog.filter($"change_id" % 3 === 1),
      fullLog.filter($"change_id" % 3 === 2)))
    assert(thirds == oneShot)
  }

  test("snapshotAsOf returns each key's version valid at business time") {
    val h = Scd2.history(fullLog, Seq("k"), "ts", "Op", Seq("change_id"))
    def at(t: String): Set[(Long, Long)] =
      Scd2.snapshotAsOf(h, org.apache.spark.sql.functions.lit(t)
          .cast("timestamp"))
        .select("k", "change_id").as[(Long, Long)].collect().toSet
    // Jan 4: k1 on version 2, k2 on 5, k3 born that midnight (inclusive)
    assert(at("2024-01-04 00:00:00") == Set((1L, 2L), (2L, 5L), (3L, 7L)))
    // Jan 6: k1 deleted on the 5th → absent; k2 updated at that instant
    assert(at("2024-01-06 00:00:00") == Set((2L, 6L), (3L, 7L)))
    // before any event: empty
    assert(at("2023-12-31 00:00:00") == Set.empty[(Long, Long)])
  }

  test("factJoin attaches the version valid at each fact's own time") {
    import org.apache.spark.sql.functions._
    val h = Scd2.history(fullLog, Seq("k"), "ts", "Op", Seq("change_id"))
    val facts = Seq(
      (100L, 1L, "2024-01-01 00:00:00"), // at k1's birth instant: inclusive
      (101L, 1L, "2024-01-04 12:00:00"), // mid k1's chain
      (102L, 1L, "2024-01-06 00:00:00"), // k1 deleted on the 5th → null
      (103L, 9L, "2024-01-03 00:00:00"), // unknown key → null
      (104L, 3L, "2023-12-01 00:00:00") // before k3's birth → null
    ).toDF("fact_id", "k", "ts_s")
      .select($"fact_id", $"k", $"ts_s".cast("timestamp").as("ts"))
    val out = Scd2.factJoin(facts, h, Seq("k"), "ts",
      Seq("change_id" -> "dim_change_id"))
      .select($"fact_id", $"dim_change_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(100L -> Some(1L), 101L -> Some(2L), 102L -> None,
      103L -> None, 104L -> None))
    // single key shuffle, like the as-of join it is
    val plan = Scd2.factJoin(facts, h, Seq("k"), "ts",
      Seq("change_id" -> "dim_change_id"))
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 <= 2,
      s"expected at most the two input shuffles:\n$plan")
  }

  test("re-delivering a batch is idempotent") {
    val dir = tmpDir("scd2d")
    val half = fullLog.filter($"ts" < "2024-01-04")
    val out = applyBatches(dir, Seq(half, half, fullLog.filter($"ts" >= "2024-01-04")))
    assert(out == hist(fullLog))
  }
}
