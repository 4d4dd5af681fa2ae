package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*): DataFrame =
    rows.toSeq.toDF("user_id", "ts_s", "event_type")
      .selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type")

  private val stages = Seq("signup", "click", "purchase")

  test("order matters: stages only count after the previous stage") {
    val df = ev(
      // user 1: full ordered funnel
      (1L, "2024-01-01 00:00:00", "signup"),
      (1L, "2024-01-01 01:00:00", "click"),
      (1L, "2024-01-01 02:00:00", "purchase"),
      // user 2: clicked BEFORE signup, clicked never after → funnel breaks
      (2L, "2024-01-01 00:00:00", "click"),
      (2L, "2024-01-01 01:00:00", "signup"),
      (2L, "2024-01-01 02:00:00", "purchase"),
      // user 3: no signup at all → not in the funnel
      (3L, "2024-01-01 00:00:00", "click"))
    val out = Funnel.counts(df, "user_id", "ts", "event_type", stages)
      .orderBy("step_idx")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "signup", 2L), // users 1 and 2
      (2L, "click", 1L), // only user 1 clicked after signup
      (3L, "purchase", 1L)))
  }

  test("tie at the same instant satisfies the next stage (inclusive)") {
    val df = ev(
      (1L, "2024-01-01 00:00:00", "signup"),
      (1L, "2024-01-01 00:00:00", "click"))
    val times = Funnel.stageTimes(df, "user_id", "ts", "event_type",
      Seq("signup", "click"))
      .select("t_1", "t_2")
      .as[(java.sql.Timestamp, java.sql.Timestamp)].head()
    assert(times._1 == times._2)
  }

  test("earliest valid occurrence wins per stage") {
    val df = ev(
      (1L, "2024-01-01 00:00:00", "signup"),
      (1L, "2024-01-01 03:00:00", "click"),
      (1L, "2024-01-01 01:00:00", "click"), // earlier, still after signup
      (1L, "2024-01-01 02:00:00", "purchase")) // after t2=01:00 → counts
    val times = Funnel.stageTimes(df, "user_id", "ts", "event_type", stages)
      .select("t_2", "t_3")
      .as[(java.sql.Timestamp, java.sql.Timestamp)].head()
    assert(times._1 == java.sql.Timestamp.valueOf("2024-01-01 01:00:00"))
    assert(times._2 == java.sql.Timestamp.valueOf("2024-01-01 02:00:00"))
  }

  test("aggregate form (funnel_stages) replays the window form exactly") {
    import org.apache.spark.sql.functions._
    // a spread of users covering every shape: full funnels, broken order,
    // missing stages, ties, repeats
    val df = ev((1L to 40L).flatMap { u =>
      val shapes = Seq(
        Seq(("signup", 0), ("click", 1), ("purchase", 2)),
        Seq(("click", 0), ("signup", 1), ("purchase", 2)),
        Seq(("signup", 0), ("signup", 1), ("click", 1), ("click", 3)),
        Seq(("purchase", 0)),
        Seq(("signup", 0), ("click", 0), ("purchase", 0))) // all tied
      shapes((u % 5).toInt).map { case (tpe, h) =>
        (u, f"2024-01-0${1 + h}%d 00:00:00", tpe)
      }
    }: _*)
    for (gap <- Seq(None, Some(90000L))) {
      val win = Funnel.stageTimes(df, "user_id", "ts", "event_type",
        stages, gap)
        .select(col("user_id"), col("t_1"), col("t_2"), col("t_3"))
        .collect().map(r => r.getLong(0) ->
          (r.get(1), r.get(2), r.get(3))).toMap
      val agg = df.groupBy("user_id")
        .agg(Funnel.stageTimesAgg(col("ts"), col("event_type"), stages,
          gap).as("st"))
        .select(col("user_id"), col("st")(0).as("t_1"),
          col("st")(1).as("t_2"), col("st")(2).as("t_3"))
        .filter(col("t_1").isNotNull) // stageTimes drops stage-1 misses
        .collect().map(r => r.getLong(0) ->
          (r.get(1), r.get(2), r.get(3))).toMap
      assert(agg == win, s"gap=$gap")
    }
  }

  test("maxGap bounds each step: late conversions fall out of the funnel") {
    val df = ev(
      // user 1: click 1h after signup → inside a 2h gap
      (1L, "2024-01-01 00:00:00", "signup"),
      (1L, "2024-01-01 01:00:00", "click"),
      // user 2: click 3h after signup → outside the 2h gap
      (2L, "2024-01-01 00:00:00", "signup"),
      (2L, "2024-01-01 03:00:00", "click"))
    val out = Funnel.counts(df, "user_id", "ts", "event_type",
        Seq("signup", "click"), maxGapSeconds = Some(7200L))
      .orderBy("step_idx").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "signup", 2L), (2L, "click", 1L)))
    // boundary: exactly maxGap counts (inclusive)
    val boundary = Funnel.counts(df, "user_id", "ts", "event_type",
        Seq("signup", "click"), maxGapSeconds = Some(10800L))
      .orderBy("step_idx").as[(Long, String, Long)].collect().toSeq
    assert(boundary == Seq((1L, "signup", 2L), (2L, "click", 2L)))
  }

  test("single shuffle: one Exchange in the stage-times plan") {
    val df = ev((1L, "2024-01-01 00:00:00", "signup"))
    val plan = Funnel.stageTimes(df, "user_id", "ts", "event_type", stages)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <=2 exchanges (windows + agg):\n$plan")
  }
}
