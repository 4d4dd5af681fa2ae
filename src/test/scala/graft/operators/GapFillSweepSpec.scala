package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class GapFillSweepSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, Double)*): DataFrame =
    rows.toSeq.toDF("user_id", "ts_s", "value")
      .selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "value")

  // ---- GapFill ----

  test("gap-fill: missing interior days appear zero-filled") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", 1.0),
      (1L, "2024-01-01 11:00:00", 2.0),
      (1L, "2024-01-04 09:00:00", 4.0))
    val out = GapFill.dailyResample(df, "user_id", "ts", col("value"))
      .orderBy("day")
      .select(col("day").cast("string"), col("n_events"), col("total_value"))
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 2L, 3.0),
      ("2024-01-02", 0L, 0.0),
      ("2024-01-03", 0L, 0.0),
      ("2024-01-04", 1L, 4.0)))
  }

  test("gap-fill: spans are per key, not global") {
    val df = ev(
      (1L, "2024-01-01 00:00:00", 1.0),
      (2L, "2024-02-10 00:00:00", 1.0),
      (2L, "2024-02-11 00:00:00", 1.0))
    val out = GapFill.dailyResample(df, "user_id", "ts", col("value"))
      .groupBy("user_id").agg(count(lit(1)).as("days"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 2L))
  }

  test("gap-fill: pathological span fails loud") {
    val df = ev(
      (1L, "1970-01-01 00:00:00", 1.0),
      (1L, "2024-01-01 00:00:00", 1.0))
    val e = intercept[Exception] {
      GapFill.dailyResample(df, "user_id", "ts", col("value")).collect()
    }
    assert(e.getMessage.contains("gap-fill span") ||
      e.getCause != null)
  }

  test("interpolate: gap days lerp between observed neighbors") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", 10.0),
      (1L, "2024-01-04 09:00:00", 40.0)) // 3-day gap → 20, 30
    val out = GapFill.dailyInterpolate(df, "user_id", "ts", col("value"))
      .orderBy("day")
      .select(col("day").cast("string"), col("value_interp"))
      .as[(String, Double)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 10.0),
      ("2024-01-02", 20.0),
      ("2024-01-03", 30.0),
      ("2024-01-04", 40.0)))
  }

  test("interpolate: observed days keep their exact value, incl. zero sums") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", 5.0),
      (1L, "2024-01-02 10:00:00", -5.0),
      (1L, "2024-01-02 11:00:00", 5.0), // observed day summing to 0.0
      (1L, "2024-01-03 10:00:00", 8.0))
    val out = GapFill.dailyInterpolate(df, "user_id", "ts", col("value"))
      .orderBy("day").select("value_interp").as[Double].collect().toSeq
    assert(out == Seq(5.0, 0.0, 8.0)) // day 2 is OBSERVED zero, not lerped
  }

  // ---- SweepLine ----

  private def iv(rows: (String, String)*): DataFrame =
    rows.toSeq.toDF("s_s", "e_s")
      .selectExpr("CAST(s_s AS TIMESTAMP) AS s", "CAST(e_s AS TIMESTAMP) AS e")

  test("sweep-line: overlap peak, closed-interval tie at a boundary") {
    // B starts exactly when A ends: both count (closed intervals).
    val df = iv(
      ("2024-01-01 00:00:00", "2024-01-01 02:00:00"),
      ("2024-01-01 02:00:00", "2024-01-01 03:00:00"),
      ("2024-01-01 01:00:00", "2024-01-01 01:30:00"))
    val out = SweepLine.dailyConcurrency(df, "s", "e")
      .select(col("day").cast("string"), col("peak"), col("open_end"))
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("2024-01-01", 2L, 0L)))
  }

  test("sweep-line: day fully inside a long interval reports the carry") {
    val df = iv(
      ("2024-01-01 12:00:00", "2024-01-03 12:00:00"),
      ("2024-01-03 00:00:00", "2024-01-03 01:00:00"))
    val out = SweepLine.dailyConcurrency(df, "s", "e")
      .orderBy("day")
      .select(col("day").cast("string"), col("peak"), col("open_end"))
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 1L, 1L), // opens, stays open
      ("2024-01-02", 1L, 1L), // no boundary events: pure carry
      ("2024-01-03", 2L, 0L))) // short interval overlaps the tail
  }

  test("sweep-line: disjoint days carry zero between them") {
    val df = iv(
      ("2024-01-01 00:00:00", "2024-01-01 01:00:00"),
      ("2024-01-03 00:00:00", "2024-01-03 01:00:00"))
    val out = SweepLine.dailyConcurrency(df, "s", "e")
      .orderBy("day")
      .select(col("day").cast("string"), col("peak"), col("open_end"))
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 1L, 0L),
      ("2024-01-02", 0L, 0L),
      ("2024-01-03", 1L, 0L)))
  }
}
