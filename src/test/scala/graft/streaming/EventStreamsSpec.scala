package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def events(rows: (Long, String, String, Double)*): DataFrame =
    rows.toSeq.toDF("user_id", "ts_s", "event_type", "value")
      .select($"user_id", $"ts_s".cast("timestamp").as("ts"),
        $"event_type", $"value")

  test("windowed counts with watermark aggregate by event-time window") {
    val dir = tmpDir("evt")
    val df = events(
      (1L, "2024-01-01 00:10:00", "click", 1.0),
      (2L, "2024-01-01 01:10:00", "click", 2.0),
      (1L, "2024-01-01 07:10:00", "purchase", 5.0))
    df.write.parquet(dir + "/in")
    // Complete mode: a single AvailableNow drain emits every window (append
    // would emit only watermark-finalized windows, which needs a LATER batch)
    val out = EventStreams.drainToMemory(spark,
      sess => EventStreams.windowedCounts(sess, dir + "/in", df.schema),
      "win_counts", dir + "/ckpt", OutputMode.Complete())
    val rows = out
      .select("window_start", "event_type", "n_events", "sum_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(rows == Set(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "click", 2L, 3.0),
      (java.sql.Timestamp.valueOf("2024-01-01 06:00:00"), "purchase", 1L, 5.0)))
  }

  test("left-outer interval join: matches eager, nulls fenced by watermark") {
    val dir = tmpDir("evt")
    val df = Seq(
      // (event_id, ts, user_id, event_type)
      (10L, "2024-01-01 00:00:30", 1L, "click"),
      (11L, "2024-01-01 00:10:00", 1L, "purchase"), // matched to click 10
      (12L, "2024-01-01 01:00:00", 2L, "purchase"), // no click: old → null row
      (13L, "2024-01-01 09:00:00", 2L, "purchase"), // no click: too new → withheld
      (14L, "2024-01-01 10:00:00", 3L, "click")) // advances click watermark to 08:00
      .toDF("event_id", "ts_s", "user_id", "event_type")
      .select($"event_id", $"ts_s".cast("timestamp").as("ts"), $"user_id",
        $"event_type")
    df.write.parquet(dir + "/in")
    val out = EventStreams.drainToMemory(spark,
      sess => EventStreams.intervalJoinLeftOuter(
        sess, dir + "/in", df.schema),
      "loj", dir + "/ckpt", OutputMode.Append())
      .select("purchase_id", "click_id")
      .as[(Long, Option[Long])].collect().toSet
    // purchase 11 matched; purchase 12 unmatched and older than the global
    // watermark (min(maxP,maxC) - 2h = 08:00) → null row; purchase 13 is
    // newer than the watermark → withheld at drain end.
    assert(out == Set((11L, Some(10L)), (12L, None)))
  }

  test("stream-static enrich: broadcast left join, stateless, dim refresh lands") {
    val dir = tmpDir("evt")
    val facts = Seq((1L, 10L), (2L, 20L), (3L, 99L)) // key 99 has no dim row
      .toDF("fact_id", "k")
    facts.write.parquet(dir + "/in")
    val dimPath = dir + "/dim"
    Seq((10L, "a"), (20L, "b")).toDF("k", "dim_v").write.parquet(dimPath)
    def drain(sink: String): Map[Long, Option[String]] =
      EventStreams.drainToMemory(spark,
        sess => EventStreams.staticEnrich(
          sess.readStream.schema(facts.schema).parquet(dir + "/in"),
          sess.read.parquet(dimPath), Seq("k")),
        sink, dir + "/ckpt_" + sink, OutputMode.Append())
        .select($"fact_id", $"dim_v").as[(Long, Option[String])]
        .collect().toMap
    assert(drain("se1") == Map(1L -> Some("a"), 2L -> Some("b"), 3L -> None))
    // stateless broadcast shape (same plan the micro-batch runs)
    val plan = EventStreams.staticEnrich(
        facts, spark.read.parquet(dimPath), Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast:\n$plan")
    assert(!plan.contains("StateStore"), s"expected stateless:\n$plan")
    // a dimension refresh is picked up by the next (fresh) drain
    Seq((10L, "a"), (20L, "b"), (99L, "late")).toDF("k", "dim_v")
      .write.mode("overwrite").parquet(dimPath)
    assert(drain("se2") ==
      Map(1L -> Some("a"), 2L -> Some("b"), 3L -> Some("late")))
  }

  test("mapGroupsWithState keeps running per-user totals across micro-batches") {
    val dir = tmpDir("evt")
    val buf = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    def drain(): Unit = {
      // foreachBatch sink: supports checkpoint recovery (memory sink does
      // not), so the state store genuinely carries across separate runs
      val q = EventStreams.runningUserTotals(spark, dir + "/in",
          events().schema)
        .writeStream.outputMode(OutputMode.Update())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[EventStreams.UserSnapshot], _: Long) =>
          buf.synchronized {
            buf ++= b.collect().map(s => (s.user_id, s.n_events, s.total_value))
          }: Unit
        }
        .option("checkpointLocation", dir + "/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    events((1L, "2024-01-01 00:00:00", "click", 1.0),
      (1L, "2024-01-01 01:00:00", "click", 2.0),
      (2L, "2024-01-01 02:00:00", "click", 10.0))
      .write.mode("append").parquet(dir + "/in")
    drain()
    val s1 = buf.toList.map { case (u, n, t) => u -> ((n, t)) }.toMap
    assert(s1(1L) == ((2L, 3.0)) && s1(2L) == ((1L, 10.0)), s"got $buf")
    // second batch arrives: state carries over through the checkpoint
    buf.clear()
    events((1L, "2024-01-01 03:00:00", "click", 4.0))
      .write.mode("append").parquet(dir + "/in")
    drain()
    val s2 = buf.toList.map { case (u, n, t) => u -> ((n, t)) }.toMap
    assert(s2 == Map(1L -> ((3L, 7.0))), s"state did not carry over: $buf")
  }
}
