package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class TemporalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, Double)*): DataFrame =
    rows.toSeq.toDF("user_id", "event_id", "ts_s", "value")
      .selectExpr("user_id", "event_id", "CAST(ts_s AS TIMESTAMP) AS ts",
        "value")

  // ---- Sessionize ----

  test("sessionize: gap strictly greater than gapSeconds starts a session") {
    val df = ev(
      (1L, 1L, "2024-01-01 00:00:00", 1.0),
      (1L, 2L, "2024-01-01 01:00:00", 1.0), // gap == 3600s: same session
      (1L, 3L, "2024-01-01 02:00:01", 1.0)) // gap 3601s: new session
    val out = Sessionize.withSessionId(df, "user_id", "ts", "event_id", 3600L)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("sessionize: sessions are per-key and 1-based") {
    val df = ev(
      (1L, 1L, "2024-01-01 00:00:00", 2.0),
      (2L, 2L, "2024-01-05 00:00:00", 3.0))
    val out = Sessionize.sessions(df, "user_id", "ts", "event_id", 60L,
      col("value")).collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Long]("session_id") == 1L))
  }

  test("sessionize rollup: bounds, counts, exact totals") {
    val df = ev(
      (1L, 1L, "2024-01-01 00:00:00", 1.5),
      (1L, 2L, "2024-01-01 00:10:00", 2.5),
      (1L, 3L, "2024-01-02 00:00:00", 4.0))
    val out = Sessionize.sessions(df, "user_id", "ts", "event_id", 3600L,
      col("value"))
      .orderBy("session_id")
      .select("session_id", "n_events", "total_value")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 4.0), (2L, 1L, 4.0)))
  }

  // ---- AsOfJoin ----

  private def asof(left: DataFrame, right: DataFrame): DataFrame =
    AsOfJoin.backward(left, right, Seq("user_id"), "ts", "event_id",
      Seq("event_id" -> "click_id"))

  test("asof: latest right row at or before left ts, inclusive on equal ts") {
    val clicks = ev(
      (1L, 10L, "2024-01-01 00:00:00", 0),
      (1L, 11L, "2024-01-01 02:00:00", 0))
    val purchases = ev(
      (1L, 20L, "2024-01-01 01:00:00", 0), // after click 10 only
      (1L, 21L, "2024-01-01 02:00:00", 0)) // ties click 11: inclusive
    val out = asof(purchases, clicks)
      .select("event_id", "click_id").as[(Long, Long)].collect().toMap
    assert(out == Map(20L -> 10L, 21L -> 11L))
  }

  test("asof: null payload when no right row precedes") {
    val clicks = ev((1L, 10L, "2024-01-01 05:00:00", 0))
    val purchases = ev((1L, 20L, "2024-01-01 01:00:00", 0))
    val out = asof(purchases, clicks).select("click_id").collect()
    assert(out.head.isNullAt(0))
  }

  test("asof: payload is atomic — null fields of the as-of row are NOT " +
    "backfilled from older rows, and fields never tear across rows") {
    import org.apache.spark.sql.functions.col
    val quotes = Seq(
      (1L, 10L, "2024-01-01 00:00:00", Some(5.0), Some(6.0)),
      (1L, 11L, "2024-01-01 02:00:00", None, Some(7.0)))
      .toDF("user_id", "event_id", "ts_s", "bid", "ask")
      .selectExpr("user_id", "event_id", "CAST(ts_s AS TIMESTAMP) AS ts",
        "bid", "ask")
    val orders = ev((1L, 20L, "2024-01-01 03:00:00", 0))
    val out = AsOfJoin.backward(orders, quotes, Seq("user_id"), "ts",
      "event_id", Seq("bid" -> "bid", "ask" -> "ask"))
      .select("bid", "ask").collect().head
    // the as-of quote is event 11: bid genuinely null, ask 7.0 — event 10's
    // bid=5.0 must not leak in
    assert(out.isNullAt(0), s"expected null bid, got $out")
    assert(out.getDouble(1) == 7.0)
  }

  test("asof: keys never match across users; equal-ts right ties pick max id") {
    val clicks = ev(
      (1L, 10L, "2024-01-01 00:00:00", 0),
      (1L, 12L, "2024-01-01 00:00:00", 0), // same ts: max event_id wins
      (2L, 11L, "2024-01-01 00:00:00", 0))
    val purchases = ev((1L, 20L, "2024-01-01 01:00:00", 0))
    val out = asof(purchases, clicks)
      .select("event_id", "click_id").as[(Long, Long)].collect().toMap
    assert(out == Map(20L -> 12L))
  }

  // ---- RangeJoin ----

  test("range join: inclusive bounds, bin-crossing pairs found, no dups") {
    val purchases = ev(
      (1L, 20L, "2024-01-01 10:00:00", 0),
      (1L, 21L, "2024-01-01 23:59:00", 0))
    val clicks = ev(
      (1L, 10L, "2024-01-01 09:00:00", 0), // exactly -1h: inclusive
      (1L, 11L, "2024-01-01 10:00:00", 0), // exactly 0: inclusive
      (1L, 12L, "2024-01-01 08:59:59", 0), // 1s too early
      (1L, 13L, "2024-01-01 23:30:00", 0), // crosses a bin boundary pair
      (2L, 14L, "2024-01-01 09:30:00", 0)) // other user
    val out = RangeJoin.bucketed(purchases, clicks, Seq("user_id"),
      "ts", "ts", -3600L, 0L, Seq("event_id" -> "click_id"))
      .select("event_id", "click_id").as[(Long, Long)].collect().toSeq
    assert(out.sorted == Seq((20L, 10L), (20L, 11L), (21L, 13L)))
  }

  test("range join plan: equi-join on (key, bin) — no cartesian/BNL join") {
    val purchases = ev((1L, 20L, "2024-01-01 10:00:00", 0))
    val clicks = ev((1L, 10L, "2024-01-01 09:30:00", 0))
    val plan = RangeJoin.bucketed(purchases, clicks, Seq("user_id"),
      "ts", "ts", -3600L, 0L, Seq("event_id" -> "click_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("asof plan: single shuffle on the key, neither side broadcast") {
    val clicks = ev((1L, 10L, "2024-01-01 00:00:00", 0))
    val purchases = ev((1L, 20L, "2024-01-01 01:00:00", 0))
    val plan = asof(purchases, clicks).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
    // one exchange for the window partitioning (plus nothing else keyed)
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 key shuffle, plan:\n$plan")
  }
}
