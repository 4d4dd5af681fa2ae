package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Event-time streaming aggregation shapes over the events stream (brief:
  * `readStream` → transforms → `writeStream`, watermarks + windowed aggs,
  * `mapGroupsWithState` for custom state). The reference emulates streaming
  * as scheduled micro-batch (SURVEY.md §1.1); these are the genuinely
  * streaming versions of its metric/feature queries.
  */
object EventStreams {

  /** Tumbling event-time window counts + value sums per event_type, with a
    * watermark bounding state. Append mode ⇒ only watermark-finalized
    * windows are emitted — the exactly-once metric feed shape. */
  def windowedCounts(
      spark: SparkSession, dir: String, schema: StructType,
      watermark: String = "2 hours", window: String = "6 hours",
      valueCol: org.apache.spark.sql.Column = col("value")): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", watermark)
      .groupBy(fn.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(valueCol).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  // alias so `window` the param doesn't shadow functions.window
  private object fn { def window(c: org.apache.spark.sql.Column, d: String) =
    org.apache.spark.sql.functions.window(c, d) }

  /** Native session windows (merge-on-gap) per user with a watermark: the
    * streaming twin of [[graft.operators.Sessionize]] — sessions close when
    * the next event is >= gap after the last (window end = last event + gap,
    * end-exclusive), and append mode emits only sessions the watermark has
    * finalized. */
  def sessionWindows(
      spark: SparkSession, dir: String, schema: StructType,
      watermark: String = "2 hours", gap: String = "4 hours"): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Watermarked stream-stream INNER interval join: purchases joined to the
    * same user's clicks within `[purchase_ts - windowSec, purchase_ts]`.
    * Both sides carry watermarks so the join's buffered state is bounded
    * (clicks older than the watermark minus the interval are evicted); for
    * an inner join the emitted pairs are exactly the batch interval-join
    * result — watermarks bound STATE, not output — which is what makes the
    * drained result oracle-checkable. */
  def intervalJoin(
      spark: SparkSession, dir: String, schema: StructType,
      watermark: String = "2 hours", windowSec: Long = 3600L): DataFrame = {
    val src = spark.readStream.schema(schema).parquet(dir)
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    purchases.join(clicks,
      col("user_id") === col("c_user_id") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowSec SECONDS") &&
        col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("user_id"), col("p_ts"),
        col("click_id"), col("c_ts"))
  }

  /** Watermarked stream-stream LEFT OUTER interval join: q73's inner join
    * plus null-padded rows for purchases with NO click in the window.
    * Outer semantics are where watermarks DO shape output (not just state):
    * an unmatched purchase can only be emitted once the watermark proves no
    * further match can arrive, i.e. once `p_ts` falls behind the terminal
    * GLOBAL watermark (Spark takes the min across both sides' watermark
    * nodes and tracks it in milliseconds) — purchases newer than that are
    * withheld at drain end, and the q149 oracle replays exactly that fence.
    * Matched pairs are emitted eagerly and carry no fence. */
  def intervalJoinLeftOuter(
      spark: SparkSession, dir: String, schema: StructType,
      watermark: String = "2 hours", windowSec: Long = 3600L): DataFrame = {
    val src = spark.readStream.schema(schema).parquet(dir)
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    purchases.join(clicks,
      col("user_id") === col("c_user_id") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowSec SECONDS") &&
        col("c_ts") <= col("p_ts"),
      "left_outer")
      .select(col("purchase_id"), col("user_id"), col("p_ts"),
        col("click_id"), col("c_ts"))
  }

  /** Streaming deduplication: first occurrence of each (user, event_type,
    * day) triple, with the watermarked day column itself part of the key so
    * state is evicted once the watermark passes it. Projected to exactly the
    * key columns BEFORE dropDuplicates — keeping payload columns would make
    * WHICH duplicate survives dependent on intra-batch arrival order. */
  def streamDedup(
      spark: SparkSession, dir: String, schema: StructType,
      watermark: String = "48 hours"): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
      .withColumn("day", date_trunc("DAY", col("ts")))
      .withWatermark("day", watermark)
      .select("user_id", "event_type", "day")
      .dropDuplicates("user_id", "event_type", "day")

  /** Stream–STATIC enrichment join — the most common production streaming
    * join (facts arrive, the dimension sits in the lake): each micro-batch
    * joins the bounded dimension with a plain BROADCAST hash join.
    * STATELESS — no state store, no watermark, nothing retained between
    * batches (plan-asserted in the spec) — and the dimension is
    * re-resolved per batch, so a dim refresh lands on the next batch. At
    * scale the cost is exactly the batch join's: the dim broadcasts, the
    * fact stream never shuffles. Left semantics: facts with no dim row
    * pass through null-padded rather than silently dropping. */
  def staticEnrich(
      stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  final case class UserEvent(user_id: Long, ts: Timestamp, value: Double)
  final case class UserRunningState(n: Long, total: Double)
  final case class UserSnapshot(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state via mapGroupsWithState: running per-user event count
    * + value total maintained across micro-batches (the KeyValueGroupedDataset
    * stateful path). NoTimeout here: a timeout-based eviction policy needs a
    * clock-advancing trigger, which deadlocks AvailableNow drains — bound
    * state by key cardinality instead (or switch to event-time timeout with
    * a watermark in a long-running deployment). */
  def runningUserTotals(
      spark: SparkSession, dir: String, schema: StructType)
      : Dataset[UserSnapshot] = {
    import spark.implicits._
    spark.readStream.schema(schema).parquet(dir)
      .select(col("user_id"), col("ts"), col("value"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (userId: Long, events: Iterator[UserEvent],
         state: GroupState[UserRunningState]) =>
          val prev =
            if (state.exists) state.get else UserRunningState(0L, 0.0)
          var n = prev.n
          var total = prev.total
          events.foreach { e => n += 1; total += e.value }
          state.update(UserRunningState(n, total))
          UserSnapshot(userId, n, total)
      }
  }

  final case class UserEventD(user_id: Long, value: BigDecimal)
  final case class UserRunningStateD(n: Long, total: BigDecimal)
  final case class UserSnapshotD(
      user_id: Long, n_events: Long, total_value: BigDecimal)

  /** ORACLE-EXACT running totals: same mapGroupsWithState shape as
    * [[runningUserTotals]], but the value accumulates as DECIMAL — exact
    * decimal addition is order-independent, so the emitted totals are
    * deterministic under any partitioning/batching (a double-accumulating
    * state folds in arrival order, whose last-ulp wobble an external engine
    * cannot replay). Snapshots are per-batch; `n_events` is strictly
    * monotone per key, so the final state is `max_by(snapshot, n_events)`
    * regardless of how AvailableNow batched the input. */
  def runningUserTotalsExact(
      spark: SparkSession, dir: String, schema: StructType)
      : Dataset[UserSnapshotD] = {
    import spark.implicits._
    spark.readStream.schema(schema).parquet(dir)
      // Null fence: a null value row would NPE the BigDecimal accumulation
      // below, and the oracle's count(*) counts rows a null-skipping sum
      // ignores — drop nulls identically on both sides (oracle SQL filters
      // `value IS NOT NULL`) so semantics agree if the testdata ever grows
      // null values.
      .filter(col("value").isNotNull)
      .select(col("user_id"),
        col("value").cast("decimal(28,10)").as("value"))
      .as[UserEventD]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (userId: Long, events: Iterator[UserEventD],
         state: GroupState[UserRunningStateD]) =>
          val prev =
            if (state.exists) state.get else UserRunningStateD(0L, BigDecimal(0))
          var n = prev.n
          var total = prev.total
          events.foreach { e => n += 1; total += e.value }
          state.update(UserRunningStateD(n, total))
          UserSnapshotD(userId, n, total)
      }
  }

  /** Drain a stream into an in-memory table named `sink` (complete/update
    * mode per aggregation type) and return the result — the AvailableNow
    * test/drive harness for the two shapes.
    *
    * State partitions are pinned low (`statePartitions`, default 8) for the
    * stream's lifetime: a streaming aggregation materializes one state-store
    * provider (with maintenance work) PER shuffle partition, sized for the
    * key cardinality — a 32-partition default burns 4x the provider/
    * checkpoint overhead for nothing on keyed state this small, and the
    * setting is per-query (pinned into the checkpoint), not global.
    *
    * The pin is applied on an ISOLATED child session (`newSession()` shares
    * the SparkContext but has its own conf + temp-view catalog), and the
    * stream is BUILT there via `mkStream` — queries planned concurrently on
    * the caller's session never observe the lowered partition count. The
    * returned DataFrame belongs to the child session; it reads like any
    * other local DataFrame. */
  def drainToMemory(
      spark: SparkSession, mkStream: SparkSession => DataFrame, sink: String,
      checkpointDir: String, mode: OutputMode,
      statePartitions: Int = 8): DataFrame = {
    val sess = spark.newSession()
    sess.conf.set("spark.sql.shuffle.partitions", statePartitions)
    val q = mkStream(sess).writeStream
      .format("memory")
      .queryName(sink)
      .outputMode(mode)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    sess.table(sink)
  }
}
