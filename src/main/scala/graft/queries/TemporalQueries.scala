package graft.queries

import java.nio.file.Paths

import graft.core.{Q, Tables}
import graft.operators.{AsOfJoin, Funnel, GapFill, RangeJoin, Scd2, Sessionize, SweepLine}
import graft.storage.TableConfig
import graft.storage.CowTable
import graft.streaming.EventStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Temporal / event-time operators over the events log — the
  * beyond-reference training-data-pipeline surface (SURVEY.md §2.6 fence):
  * gap sessionization, backward as-of join, and a genuinely streaming
  * watermarked window aggregation whose drained result is oracle-checked.
  */
object TemporalQueries {
  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.table(s, d, n)

  /** The events log re-expressed as a DMS-shaped change stream (same op
    * mapping as StorageQueries.cdcBatch, but over the FULL log — SCD2
    * consumes every change, not just the post-cutoff tail). */
  private def dmsLog(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").select(
      when(col("event_type") === "error", "D")
        .when(col("event_type") === "signup", "I")
        .otherwise("U").as("Op"),
      col("ts").as("timestamp"),
      col("user_id"), col("event_id"), col("event_type"), col("value"))

  /** Shared DuckDB replay of the SCD2 interval semantics (q170/q171 must
    * converge to the same history regardless of batching). */
  private val scd2OracleSql: String =
    """WITH cdc AS (SELECT
      |    CASE WHEN event_type = 'error' THEN 'D'
      |         WHEN event_type = 'signup' THEN 'I'
      |         ELSE 'U' END AS op,
      |    CAST(ts AS TIMESTAMP) AS ts, user_id, event_id, event_type, value
      |  FROM events),
      |h AS (SELECT *, lead(ts) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id) AS valid_to FROM cdc)
      |SELECT user_id, event_id, event_type, value, ts AS valid_from,
      |  valid_to, CAST(valid_to IS NULL AS INT) AS is_current
      |FROM h WHERE op <> 'D'
      |""".stripMargin

  val all: Seq[Q] = Seq(

    // Gap sessionization (4h gap): lag/running-sum window + session rollup.
    // Exact int64 microsecond gap test on both sides; DECIMAL value total.
    Q("q59_sessionize",
      """WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |              value FROM events),
        |f AS (SELECT user_id, event_id, ts, value,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |         IS NULL
        |       OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
        |            ORDER BY ts, event_id)) > 14400000000
        |       THEN 1 ELSE 0 END AS new_s
        |  FROM ev),
        |g AS (SELECT user_id, ts, value,
        |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) AS session_id
        |      FROM f)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value
        |FROM g GROUP BY user_id, session_id
        |""".stripMargin) { (s, d) =>
      Sessionize.sessions(
        t(s, d, "events"), "user_id", "ts", "event_id",
        gapSeconds = 14400L, valueCol = col("value"))
    },

    // Backward as-of join: each purchase attributed to the latest click of
    // the same user at or before its timestamp (single key-shuffle window
    // carry — no range-join explosion; see AsOfJoin).
    Q("q60_asof_join",
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |              CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |p AS (SELECT event_id, user_id, ts, value FROM ev
        |      WHERE event_type = 'purchase'),
        |c AS (SELECT event_id, user_id, ts FROM ev
        |      WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts, p.value,
        |       a.click_id, a.click_ts
        |FROM p LEFT JOIN LATERAL (
        |  SELECT c.event_id AS click_id, c.ts AS click_ts
        |  FROM c WHERE c.user_id = p.user_id AND c.ts <= p.ts
        |  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) a ON TRUE
        |""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      AsOfJoin.backward(
        ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value"),
        ev.filter(col("event_type") === "click"),
        keyCols = Seq("user_id"), tsCol = "ts", tieCol = "event_id",
        payload = Seq("event_id" -> "click_id", "ts" -> "click_ts"))
        .select("event_id", "user_id", "ts", "value", "click_id", "click_ts")
    },

    // Streaming watermarked tumbling-window aggregation, drained with
    // AvailableNow into a memory sink. Append mode emits exactly the windows
    // finalized by the terminal watermark (max event time - 2h), which the
    // oracle replays: epoch-aligned 6h buckets with window_end <= watermark.
    Q("q61_stream_window_agg",
      """WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value
        |            FROM events),
        |wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM ev),
        |b AS (SELECT make_timestamp(CAST(floor(epoch_us(ts) / 21600000000)
        |         * 21600000000 AS BIGINT)) AS window_start,
        |        event_type, count(*) AS n_events,
        |        CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE)
        |          AS sum_value
        |      FROM ev GROUP BY 1, 2)
        |SELECT window_start, event_type, n_events, sum_value
        |FROM b, wm WHERE window_start + INTERVAL 6 HOUR <= wm.w
        |""".stripMargin) { (s, d) =>
      val base = StorageQueries.tableDir("q61")
      CowTable.deleteRecursively(Paths.get(base))
      // stage through a µs-timestamp parquet landing dir (the raw fixture is
      // TIMESTAMP(NANOS), which the batch loader normalizes)
      val src = base + "/src"
      t(s, d, "events").select("event_id", "ts", "event_type", "value")
        .write.parquet(src)
      val schema = s.read.parquet(src).schema
      EventStreams.drainToMemory(
        s, sess => EventStreams.windowedCounts(
          sess, src, schema, valueCol = col("value").cast("decimal(28,10)")),
        "q61_sink", base + "/ckpt", OutputMode.Append())
        .select(col("window_start"), col("event_type"), col("n_events"),
          col("sum_value").cast("double").as("sum_value"))
    },

    // Native session windows in streaming mode (merge-on-gap, watermarked):
    // q59's gap semantics via Spark's session_window operator — sessions
    // break at gap >= 4h (end-exclusive window), end = last event + gap,
    // and only watermark-finalized sessions are emitted.
    Q("q65_stream_sessionize",
      """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM ev),
        |f AS (SELECT user_id, ts,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |       OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
        |            ORDER BY ts)) >= 14400000000
        |       THEN 1 ELSE 0 END AS new_s
        |  FROM ev),
        |g AS (SELECT user_id, ts,
        |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |          ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM f),
        |sess AS (SELECT user_id, min(ts) AS session_start,
        |           max(ts) + INTERVAL 4 HOUR AS session_end,
        |           count(*) AS n_events
        |         FROM g GROUP BY user_id, sid)
        |SELECT user_id, session_start, session_end, n_events
        |FROM sess, wm WHERE session_end <= wm.w
        |""".stripMargin) { (s, d) =>
      val base = StorageQueries.tableDir("q65")
      CowTable.deleteRecursively(Paths.get(base))
      val src = base + "/src"
      t(s, d, "events").select("event_id", "ts", "user_id", "value")
        .write.parquet(src)
      val schema = s.read.parquet(src).schema
      EventStreams.drainToMemory(
        s, sess => EventStreams.sessionWindows(sess, src, schema),
        "q65_sink", base + "/ckpt", OutputMode.Append())
    },

    // Bucketed range join: clicks by the same user in the hour before each
    // purchase (inclusive window), counted per purchase. The operator bins
    // the time axis at the window span so it's a plain equi-join on
    // (user, bin) — no cross/broadcast-nested-loop join (see RangeJoin).
    Q("q66_range_join",
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |              CAST(ts AS TIMESTAMP) AS ts FROM events),
        |p AS (SELECT event_id, user_id, ts FROM ev
        |      WHERE event_type = 'purchase'),
        |c AS (SELECT event_id, user_id, ts FROM ev
        |      WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts,
        |  count(c.event_id) AS n_recent_clicks
        |FROM p LEFT JOIN c ON c.user_id = p.user_id
        |  AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
        |  AND epoch_us(c.ts) <= epoch_us(p.ts)
        |GROUP BY p.event_id, p.user_id, p.ts
        |""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
      val pairs = RangeJoin.bucketed(
        purchases, clicks, keyCols = Seq("user_id"),
        leftTs = "ts", rightTs = "ts",
        lowerSec = -3600L, upperSec = 0L,
        payload = Seq("event_id" -> "click_id"))
      val counts = pairs.groupBy("event_id")
        .agg(count(lit(1)).as("n_recent_clicks"))
      purchases.join(counts, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"), col("ts"),
          coalesce(col("n_recent_clicks"), lit(0L)).as("n_recent_clicks"))
    },

    // Watermarked stream-stream interval join drained with AvailableNow:
    // same pairs as q66's batch range join, produced by the streaming
    // operator with bounded buffered state (inner join => watermarks bound
    // state, not output, so the result is exactly the batch interval join).
    Q("q73_stream_join",
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |              CAST(ts AS TIMESTAMP) AS ts FROM events),
        |p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts FROM ev
        |      WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id, ts AS c_ts FROM ev
        |      WHERE event_type = 'click')
        |SELECT p.purchase_id, p.user_id, p.p_ts, c.click_id, c.c_ts
        |FROM p JOIN c ON c.user_id = p.user_id
        |  AND epoch_us(c.c_ts) >= epoch_us(p.p_ts) - 3600000000
        |  AND epoch_us(c.c_ts) <= epoch_us(p.p_ts)
        |""".stripMargin) { (s, d) =>
      val base = StorageQueries.tableDir("q73")
      CowTable.deleteRecursively(Paths.get(base))
      val src = base + "/src"
      t(s, d, "events").select("event_id", "ts", "user_id", "event_type")
        .write.parquet(src)
      val schema = s.read.parquet(src).schema
      EventStreams.drainToMemory(
        s, sess => EventStreams.intervalJoin(sess, src, schema),
        "q73_sink", base + "/ckpt", OutputMode.Append())
    },

    // Stream-stream LEFT OUTER interval join: matched pairs exactly as q73,
    // plus null-padded purchases with no click in the hour window — emitted
    // only once the terminal watermark proves no match can still arrive.
    // The one streaming join shape where the watermark fences OUTPUT rows;
    // the oracle replays Spark's exact fence: the GLOBAL watermark is the
    // min across both sides' watermark nodes (here the click side's, which
    // trails), tracked in ms (hence the epoch-ms floor), minus the 2h delay.
    Q("q149_stream_left_join",
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |              CAST(ts AS TIMESTAMP) AS ts FROM events),
        |p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts FROM ev
        |      WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id, ts AS c_ts FROM ev
        |      WHERE event_type = 'click'),
        |wm AS (SELECT make_timestamp(CAST(floor(epoch_us(least(
        |           (SELECT max(p_ts) FROM p), (SELECT max(c_ts) FROM c)))
        |         / 1000) * 1000 AS BIGINT)) - INTERVAL 2 HOUR AS w),
        |m AS (SELECT p.purchase_id, p.user_id, p.p_ts, c.click_id, c.c_ts
        |      FROM p JOIN c ON c.user_id = p.user_id
        |        AND epoch_us(c.c_ts) >= epoch_us(p.p_ts) - 3600000000
        |        AND epoch_us(c.c_ts) <= epoch_us(p.p_ts)),
        |um AS (SELECT p.purchase_id, p.user_id, p.p_ts,
        |         CAST(NULL AS BIGINT) AS click_id,
        |         CAST(NULL AS TIMESTAMP) AS c_ts
        |       FROM p, wm WHERE p.p_ts < wm.w AND NOT EXISTS (
        |         SELECT 1 FROM c WHERE c.user_id = p.user_id
        |           AND epoch_us(c.c_ts) >= epoch_us(p.p_ts) - 3600000000
        |           AND epoch_us(c.c_ts) <= epoch_us(p.p_ts)))
        |SELECT * FROM m UNION ALL SELECT * FROM um
        |""".stripMargin) { (s, d) =>
      val base = StorageQueries.tableDir("q149")
      CowTable.deleteRecursively(Paths.get(base))
      val src = base + "/src"
      t(s, d, "events").select("event_id", "ts", "user_id", "event_type")
        .write.parquet(src)
      val schema = s.read.parquet(src).schema
      EventStreams.drainToMemory(
        s, sess => EventStreams.intervalJoinLeftOuter(sess, src, schema),
        "q149_sink", base + "/ckpt", OutputMode.Append())
    },

    // Streaming dedup with watermark-bounded state: first occurrence of each
    // (user, event_type, day) triple. Deterministic because the output IS
    // the key (payload projected away pre-dedup), so the drained result is
    // exactly the batch DISTINCT.
    Q("q78_stream_dedup",
      """SELECT DISTINCT user_id, event_type,
        |  date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
        |FROM events
        |""".stripMargin) { (s, d) =>
      val base = StorageQueries.tableDir("q78")
      CowTable.deleteRecursively(Paths.get(base))
      val src = base + "/src"
      t(s, d, "events").select("event_id", "ts", "user_id", "event_type")
        .write.parquet(src)
      val schema = s.read.parquet(src).schema
      EventStreams.drainToMemory(
        s, sess => EventStreams.streamDedup(sess, src, schema),
        "q78_sink", base + "/ckpt", OutputMode.Append())
    },

    // CUSTOM KEYED STATE (mapGroupsWithState) with an exact oracle: running
    // per-user count + DECIMAL-exact value total. Exact decimal addition is
    // order-independent, and n_events is strictly monotone per key, so
    // max_by(snapshot, n_events) is the final state no matter how
    // AvailableNow batched the drain — the drained result equals the batch
    // aggregate an external engine computes.
    Q("q120_stream_state",
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value
        |FROM events WHERE value IS NOT NULL GROUP BY user_id
        |""".stripMargin) { (s, d) =>
      val base = StorageQueries.tableDir("q120")
      CowTable.deleteRecursively(Paths.get(base))
      val src = base + "/src"
      t(s, d, "events").select("event_id", "ts", "user_id", "value")
        .write.parquet(src)
      val schema = s.read.parquet(src).schema
      EventStreams.drainToMemory(
        s, sess => EventStreams.runningUserTotalsExact(sess, src, schema)
          .toDF(),
        "q120_sink", base + "/ckpt", OutputMode.Update())
        .groupBy("user_id")
        .agg(max(col("n_events")).as("n_events"),
          max_by(col("total_value"), col("n_events")).as("__total"))
        .select(col("user_id"), col("n_events"),
          col("__total").cast("double").as("total_value"))
    },

    // SLIDING EVENT-TIME WINDOW FEATURES (per-event trailing aggregates —
    // the classic activity-feature shape): for every event, the count and
    // DECIMAL-exact value sum of the same user's events in the trailing
    // hour, via a RANGE frame over int64 micros. RANGE (not ROWS) makes
    // tied timestamps frame-identical, so the result is deterministic
    // under any partitioning; the window shuffles once on user_id with
    // O(frame) state per partition — the 100 TB shape for per-entity
    // temporal features. NTZ-tolerant micros via operators/EventTime.
    Q("q133_sliding_window_features",
      """WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP))
        |    AS m, value FROM events)
        |SELECT user_id, event_id,
        |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(sum(CAST(value AS DECIMAL(28,10))) OVER w AS DOUBLE)
        |    AS value_1h
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY m
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("m"))
        .rangeBetween(-3600000000L, 0L)
      ev.select(col("user_id"), col("event_id"),
          graft.operators.EventTime.micros(ev, "ts").as("m"),
          col("value"))
        .select(col("user_id"), col("event_id"),
          count(lit(1)).over(w).cast("long").as("n_1h"),
          sum(col("value").cast("decimal(28,10)")).over(w)
            .cast("double").as("value_1h"))
    },

    // Calendar gap-fill: per-user daily series over the user's own active
    // span, missing days zero-filled. Spine generated per key with
    // sequence+explode (distributed — see GapFill scaladoc).
    Q("q144_gap_fill",
      """WITH ev AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE)
        |              AS day, value FROM events),
        |daily AS (SELECT user_id, day, count(*) AS n_events,
        |            sum(CAST(value AS DECIMAL(28,10))) AS v
        |          FROM ev GROUP BY 1, 2),
        |bounds AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |           FROM daily GROUP BY 1),
        |spine AS (SELECT user_id,
        |            CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |              CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |          FROM bounds)
        |SELECT s.user_id, s.day,
        |  coalesce(d.n_events, 0) AS n_events,
        |  CAST(coalesce(d.v, 0) AS DOUBLE) AS total_value
        |FROM spine s LEFT JOIN daily d
        |  ON d.user_id = s.user_id AND d.day = s.day
        |""".stripMargin) { (s, d) =>
      GapFill.dailyResample(t(s, d, "events"), "user_id", "ts", col("value"))
    },

    // Daily session-concurrency profile: peak simultaneously-open 4h-gap
    // sessions per day + count still open at day end. Scalable two-level
    // prefix sum (see SweepLine scaladoc); the oracle replays the textbook
    // single global running sum over every session boundary.
    Q("q145_session_concurrency",
      """WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |            FROM events),
        |f AS (SELECT user_id, event_id, ts,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |         IS NULL
        |       OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
        |            ORDER BY ts, event_id)) > 14400000000
        |       THEN 1 ELSE 0 END AS new_s
        |  FROM ev),
        |g AS (SELECT user_id, ts,
        |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) AS session_id
        |      FROM f),
        |iv AS (SELECT min(ts) AS s0, max(ts) AS s1 FROM g
        |       GROUP BY user_id, session_id),
        |d AS (SELECT s0 AS t, 1 AS delta FROM iv
        |      UNION ALL SELECT s1, -1 FROM iv),
        |runs AS (SELECT CAST(t AS DATE) AS day, delta,
        |           sum(delta) OVER (ORDER BY t, delta DESC
        |             ROWS UNBOUNDED PRECEDING) AS run
        |         FROM d),
        |perday AS (SELECT day, sum(delta) AS tot, max(run) AS gpeak
        |           FROM runs GROUP BY day),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM perday),
        |spine AS (SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |            CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |          FROM b),
        |filled AS (SELECT s.day, coalesce(p.tot, 0) AS tot0, p.gpeak
        |         FROM spine s LEFT JOIN perday p ON p.day = s.day),
        |c AS (SELECT day, tot0, gpeak,
        |        coalesce(sum(tot0) OVER (ORDER BY day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS cin
        |      FROM filled)
        |SELECT day, CAST(greatest(cin, coalesce(gpeak, cin)) AS BIGINT)
        |    AS peak,
        |  CAST(cin + tot0 AS BIGINT) AS open_end
        |FROM c
        |""".stripMargin) { (s, d) =>
      val sessions = Sessionize.sessions(
        t(s, d, "events"), "user_id", "ts", "event_id",
        gapSeconds = 14400L, valueCol = col("value"))
      SweepLine.dailyConcurrency(sessions, "session_start", "session_end")
    },

    // Linear-interpolation resample: q144's spine with gap days LERPed
    // between the nearest observed days (IGNORE NULLS window carry in both
    // directions; every gap day has both neighbors because the spine spans
    // observed days only). One key shuffle shared by join + windows.
    Q("q157_interpolate",
      s"""WITH ev AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE)
         |              AS day, value FROM events),
         |daily AS (SELECT user_id, day, count(*) AS n_events,
         |            sum(CAST(value AS DECIMAL(28,10))) AS v
         |          FROM ev GROUP BY 1, 2),
         |bounds AS (SELECT user_id, min(day) AS d0, max(day) AS d1
         |           FROM daily GROUP BY 1),
         |spine AS (SELECT user_id,
         |            CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
         |              CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
         |          FROM bounds),
         |f AS (SELECT s.user_id, s.day,
         |        coalesce(d.n_events, 0) AS n_events,
         |        CAST(d.v AS DOUBLE) AS ov, d.day AS od
         |      FROM spine s LEFT JOIN daily d
         |        ON d.user_id = s.user_id AND d.day = s.day),
         |w AS (SELECT user_id, day, n_events,
         |        last_value(ov IGNORE NULLS) OVER wp AS pv,
         |        last_value(od IGNORE NULLS) OVER wp AS pd,
         |        first_value(ov IGNORE NULLS) OVER wn AS nv,
         |        first_value(od IGNORE NULLS) OVER wn AS nd,
         |        ov
         |      FROM f
         |      WINDOW wp AS (PARTITION BY user_id ORDER BY day
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |        wn AS (PARTITION BY user_id ORDER BY day
         |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT user_id, day, n_events,
         |  ${graft.core.Parity.round4Sql(
             """CASE WHEN n_events > 0 THEN ov
               |     ELSE pv + (nv - pv)
               |       * CAST(date_diff('day', pd, day) AS DOUBLE)
               |       / CAST(date_diff('day', pd, nd) AS DOUBLE) END"""
               .stripMargin)} AS value_interp
         |FROM w
         |""".stripMargin) { (s, d) =>
      GapFill.dailyInterpolate(
        t(s, d, "events"), "user_id", "ts", col("value"))
    },

    // Funnel stage times via the MERGEABLE AGGREGATE form (q155's window
    // shape re-expressed as `GROUP BY user` + funnel_stages, the SQL
    // surface): per-stage sorted-distinct-micros state combines map-side,
    // the dependent walk runs once at finish — only per-user stage times
    // ever shuffle, vs the window form shuffling every event row. The
    // oracle replays the textbook three-join form per user.
    Q("q165_funnel_stage_times",
      """WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |            FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t_1 FROM ev
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT s1.user_id, min(e.ts) AS t_2 FROM s1
        |       JOIN ev e ON e.user_id = s1.user_id
        |        AND e.event_type = 'click' AND e.ts >= s1.t_1 GROUP BY 1),
        |s3 AS (SELECT s2.user_id, min(e.ts) AS t_3 FROM s2
        |       JOIN ev e ON e.user_id = s2.user_id
        |        AND e.event_type = 'purchase' AND e.ts >= s2.t_2 GROUP BY 1)
        |SELECT s1.user_id, s1.t_1, s2.t_2, s3.t_3
        |FROM s1 LEFT JOIN s2 ON s2.user_id = s1.user_id
        |LEFT JOIN s3 ON s3.user_id = s1.user_id
        |""".stripMargin) { (s, d) =>
      t(s, d, "events").groupBy("user_id")
        .agg(Funnel.stageTimesAgg(col("ts"), col("event_type"),
          Seq("signup", "click", "purchase")).as("st"))
        .select(col("user_id"), col("st")(0).as("t_1"),
          col("st")(1).as("t_2"), col("st")(2).as("t_3"))
        .filter(col("t_1").isNotNull)
    },

    // Cohort retention via the SINGLE-AGGREGATE form (q156's
    // two-agg+join shape collapsed into `GROUP BY user` + cohort_weeks +
    // explode — ONE shuffle of the event log, state O(distinct active
    // weeks per user)). Oracle = the textbook two-agg+join replay.
    Q("q166_cohort_agg",
      """WITH ev AS (SELECT user_id,
        |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
        |  FROM events),
        |first_wk AS (SELECT user_id, min(wk) AS cohort_week FROM ev
        |             GROUP BY 1),
        |act AS (SELECT DISTINCT e.user_id, f.cohort_week,
        |          CAST(date_diff('day', f.cohort_week, e.wk) / 7 AS BIGINT)
        |            AS week_offset
        |        FROM ev e JOIN first_wk f ON f.user_id = e.user_id)
        |SELECT cohort_week, week_offset, count(*) AS n_active
        |FROM act GROUP BY 1, 2
        |""".stripMargin) { (s, d) =>
      t(s, d, "events").groupBy("user_id")
        .agg(graft.operators.Cohort.cohortWeeks(col("ts")).as("c"))
        .select(col("c.cohort_week").as("cohort_week"),
          explode(col("c.offsets")).as("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("n_active"))
    },

    // Ordered funnel (signup → click → purchase): per-user stage-reach
    // times as chained whole-partition window mins — ONE key shuffle, no
    // self-joins (see Funnel scaladoc); the oracle replays the textbook
    // three-join form.
    Q("q155_funnel",
      """WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |            FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM ev
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT s1.user_id, min(e.ts) AS t2 FROM s1
        |       JOIN ev e ON e.user_id = s1.user_id
        |        AND e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY 1),
        |s3 AS (SELECT s2.user_id, min(e.ts) AS t3 FROM s2
        |       JOIN ev e ON e.user_id = s2.user_id
        |        AND e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY 1)
        |SELECT CAST(1 AS BIGINT) AS step_idx, 'signup' AS step,
        |       count(*) AS n_users FROM s1
        |UNION ALL SELECT 2, 'click', count(*) FROM s2
        |UNION ALL SELECT 3, 'purchase', count(*) FROM s3
        |""".stripMargin) { (s, d) =>
      Funnel.counts(t(s, d, "events"), "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"))
    },

    // Weekly cohort retention: users grouped by the week of their FIRST
    // event; for each later week, how many of the cohort were active.
    // Two hash aggregates + one user-keyed join — the event log shuffles
    // once on user_id, never per offset.
    Q("q156_cohort_retention",
      """WITH ev AS (SELECT user_id,
        |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
        |  FROM events),
        |first_wk AS (SELECT user_id, min(wk) AS cohort_week FROM ev
        |             GROUP BY 1),
        |act AS (SELECT DISTINCT e.user_id, f.cohort_week,
        |          CAST(date_diff('day', f.cohort_week, e.wk) / 7 AS BIGINT)
        |            AS week_offset
        |        FROM ev e JOIN first_wk f ON f.user_id = e.user_id)
        |SELECT cohort_week, week_offset, count(*) AS n_active
        |FROM act GROUP BY 1, 2
        |""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk"))
      val firstWk = ev.groupBy("user_id")
        .agg(min(col("wk")).as("cohort_week"))
      ev.join(firstWk, "user_id")
        .select(col("user_id"), col("cohort_week"),
          (datediff(col("wk"), col("cohort_week")) / 7).cast("long")
            .as("week_offset"))
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("n_active"))
    },

    // SCD2 HISTORY MATERIALIZATION: the full CDC change log → a type-2
    // dimension table (valid_from/valid_to/is_current) — the audit/history
    // complement of the reference's latest-state MERGE. One lead-window
    // pass per key (single shuffle, O(1) frame); 'D' tombstones close
    // their predecessor's interval and emit no row.
    Q("q170_scd2_history", scd2OracleSql) { (s, d) =>
      Scd2.history(dmsLog(s, d), Seq("user_id"), "timestamp", "Op",
          Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("valid_from"), col("valid_to"),
          col("is_current").cast("int").as("is_current"))
    },

    // INCREMENTAL SCD2 (the hourly CDC-loop deployment shape): the same
    // history built as a LAKE TABLE in two batches split at an event-time
    // cutoff — each apply replays only the affected keys' stored change
    // rows (semi-join + merge pruning; never the full log), and the final
    // state is a pure function of the event set, so the ORACLE IS
    // IDENTICAL to the one-shot q170 replay.
    Q("q171_scd2_incremental", scd2OracleSql) { (s, d) =>
      val dir = StorageQueries.tableDir("q171")
      CowTable.deleteRecursively(Paths.get(dir))
      val tbl = CowTable(s, dir,
        TableConfig("ev_scd2", Seq("user_id", "event_id")))
      val log = dmsLog(s, d)
      val cut = lit("2024-01-15 00:00:00").cast("timestamp")
      Scd2.applyBatch(tbl, log.filter(col("timestamp") < cut),
        Seq("user_id"), "timestamp", "Op", Seq("event_id"))
      Scd2.applyBatch(tbl, log.filter(col("timestamp") >= cut),
        Seq("user_id"), "timestamp", "Op", Seq("event_id"))
      Scd2.historyView(tbl)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("valid_from"), col("valid_to"),
          col("is_current").cast("int").as("is_current"))
    },

    // CONTINUOUS SCD2: the CDC stream drained through Scd2.applyBatch per
    // micro-batch (foreachBatch + AvailableNow, file-source checkpoint as
    // the bookmark) into a lake-table history — the reference's CDC loop
    // with a versioned dimension instead of latest-state MERGE as the
    // sink. The log is split across files in NO particular order: SCD2's
    // event-set purity makes the drain converge to the one-shot replay for
    // any micro-batch partitioning, so the oracle is q170's verbatim.
    Q("q184_stream_scd2", scd2OracleSql) { (s, d) =>
      val base = StorageQueries.tableDir("q184")
      CowTable.deleteRecursively(Paths.get(base))
      val tbl = CowTable(s, base + "/table",
        TableConfig("ev_scd2_stream", Seq("user_id", "event_id")))
      val cdcDir = base + "/cdc"
      dmsLog(s, d).repartition(3).write.parquet(cdcDir)
      val schema = s.read.parquet(cdcDir).schema
      graft.streaming.CdcStream.runScd2AvailableNow(
        s, tbl, cdcDir, base + "/ckpt", schema, Seq("user_id"))
      Scd2.historyView(tbl)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("valid_from"), col("valid_to"),
          col("is_current").cast("int").as("is_current"))
    },

    // SCD2 POINT-IN-TIME snapshot ("what did every user's row look like on
    // Jan 20"): a pure interval filter over the q170 history —
    // valid_from <= t < valid_to over half-open intervals; keys deleted
    // before t or born after it produce no row. No window, no join.
    Q("q177_scd2_as_of",
      """WITH cdc AS (SELECT
        |    CASE WHEN event_type = 'error' THEN 'D'
        |         WHEN event_type = 'signup' THEN 'I'
        |         ELSE 'U' END AS op,
        |    CAST(ts AS TIMESTAMP) AS ts, user_id, event_id, event_type, value
        |  FROM events),
        |h AS (SELECT *, lead(ts) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS valid_to FROM cdc)
        |SELECT user_id, event_id, event_type, value,
        |  ts AS as_of_version_start
        |FROM h WHERE op <> 'D'
        |  AND ts <= TIMESTAMP '2024-01-20 00:00:00'
        |  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-20 00:00:00')
        |""".stripMargin) { (s, d) =>
      Scd2.snapshotAsOf(
        Scd2.history(dmsLog(s, d), Seq("user_id"), "timestamp", "Op",
          Seq("event_id")),
        lit("2024-01-20 00:00:00").cast("timestamp"))
        .select("user_id", "event_id", "event_type", "value",
          "as_of_version_start")
    },

    // SCD2 FACT JOIN (point-in-time-correct enrichment): behavioral facts
    // (click/view) attach the profile version (built from
    // signup/purchase/error changes) valid AT THE FACT'S OWN TIMESTAMP —
    // never a later version (the training-feature leakage rule). Facts
    // whose user was deleted before, born after, or never seen get NULL
    // dims. One key shuffle (union + window carry), vs the oracle's
    // interval LEFT JOIN — intervals partition the timeline, so the join
    // is 1:≤1 and the replay is row-exact.
    Q("q179_scd2_fact_join",
      """WITH cdc AS (SELECT
        |    CASE WHEN event_type = 'error' THEN 'D'
        |         WHEN event_type = 'signup' THEN 'I'
        |         ELSE 'U' END AS op,
        |    CAST(ts AS TIMESTAMP) AS ts, user_id, event_id, value
        |  FROM events WHERE event_type IN ('signup', 'error', 'purchase')),
        |h AS (SELECT *, lead(ts) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS valid_to FROM cdc),
        |hist AS (SELECT * FROM h WHERE op <> 'D')
        |SELECT f.event_id, f.user_id, f.event_type,
        |  hist.event_id AS dim_event_id, hist.value AS dim_value
        |FROM events f
        |LEFT JOIN hist ON f.user_id = hist.user_id
        |  AND hist.ts <= CAST(f.ts AS TIMESTAMP)
        |  AND (hist.valid_to IS NULL OR hist.valid_to > CAST(f.ts AS TIMESTAMP))
        |WHERE f.event_type IN ('click', 'view')
        |""".stripMargin) { (s, d) =>
      val hist = Scd2.history(
        dmsLog(s, d)
          .filter(col("event_type").isin("signup", "error", "purchase")),
        Seq("user_id"), "timestamp", "Op", Seq("event_id"))
      val facts = t(s, d, "events")
        .filter(col("event_type").isin("click", "view"))
        .select("event_id", "ts", "user_id", "event_type")
      Scd2.factJoin(facts, hist, Seq("user_id"), "ts",
        Seq("event_id" -> "dim_event_id", "value" -> "dim_value"))
        .select("event_id", "user_id", "event_type", "dim_event_id",
          "dim_value")
    },

    // PATH ANALYSIS (top navigation sequences): each 4h-gap session's
    // ordered event-type sequence becomes a '>'-joined path string, then
    // the global top-20 paths by session count (ties broken by path — a
    // deterministic top-k). One session window + two hash aggregates; the
    // per-session sort is bounded by session length, never a global sort.
    Q("q188_path_analysis",
      """WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |              event_type FROM events),
        |f AS (SELECT user_id, event_id, ts, event_type,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |         IS NULL
        |       OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
        |            ORDER BY ts, event_id)) > 14400000000
        |       THEN 1 ELSE 0 END AS new_s
        |  FROM ev),
        |g AS (SELECT user_id, event_id, ts, event_type,
        |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM f),
        |p AS (SELECT user_id, sid,
        |        string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |      FROM g GROUP BY user_id, sid)
        |SELECT path, count(*) AS n_sessions FROM p GROUP BY 1
        |ORDER BY n_sessions DESC, path LIMIT 20
        |""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
        .select("user_id", "event_id", "ts", "event_type")
      Sessionize.withSessionId(ev, "user_id", "ts", "event_id", 14400L)
        .groupBy(col("user_id"), col("session_id"))
        .agg(array_join(
          transform(
            array_sort(collect_list(
              struct(col("ts"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")), ">").as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(20)
    },

    // ROLLING 7-DAY ACTIVE USERS (the DAU/WAU shape): distinct (day,
    // user) pairs once — O(days × users), the only state that matters —
    // then a BROADCAST day-range join (the day dimension is tiny by
    // construction) fans each pair into its ≤7 windows and a count
    // distinct closes it. Never a rolling window over raw events, never a
    // per-day rescan: the classic scalable formulation.
    Q("q189_rolling_active",
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |            FROM events),
        |days AS (SELECT DISTINCT day AS d FROM du)
        |SELECT d, count(DISTINCT user_id) AS wau7
        |FROM days JOIN du ON du.day >= d - 6 AND du.day <= d
        |GROUP BY d
        |""".stripMargin) { (s, d) =>
      val du = t(s, d, "events")
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val days = du.select(col("day").as("d")).distinct()
      du.join(broadcast(days),
          col("day") >= date_sub(col("d"), 6) && col("day") <= col("d"))
        .groupBy(col("d"))
        .agg(countDistinct(col("user_id")).as("wau7"))
    },

    // STREAM–STATIC enrichment join: the order stream joins the bounded
    // customer dimension per micro-batch with a broadcast hash join —
    // STATELESS (no state store, no watermark), so the drained result is
    // batch-identical by construction and the oracle is the plain LEFT
    // JOIN. The production shape for "facts arrive, dimension sits in the
    // lake".
    Q("q182_stream_static_join",
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
        |  c.c_name, c.c_mktsegment
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |""".stripMargin) { (s, d) =>
      val base = StorageQueries.tableDir("q182")
      CowTable.deleteRecursively(Paths.get(base))
      val src = base + "/src"
      t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        .write.parquet(src)
      val schema = s.read.parquet(src).schema
      EventStreams.drainToMemory(
        s, sess => EventStreams.staticEnrich(
          sess.readStream.schema(schema).parquet(src),
          t(sess, d, "customer")
            .select("c_custkey", "c_name", "c_mktsegment")
            .withColumnRenamed("c_custkey", "o_custkey"),
          Seq("o_custkey")),
        "q182_sink", base + "/ckpt", OutputMode.Append())
    })
}
