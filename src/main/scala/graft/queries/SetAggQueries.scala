package graft.queries

import graft.core.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational breadth beyond the reference's own query set (SURVEY.md §2.6
  * lists these as absent there): multidimensional aggregates (ROLLUP),
  * set operators (INTERSECT/EXCEPT), and pivot — the standard analytic
  * surface a lake's SQL consumers expect. All are single-shuffle hash
  * aggregates / set ops; nothing here changes shape at 100 TB.
  */
object SetAggQueries {
  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.table(s, d, n)

  val all: Seq[Q] = Seq(

    // ROLLUP over (returnflag, linestatus): subtotal + grand-total rows,
    // grouping() flags distinguish rollup NULLs from data NULLs.
    Q("q62_rollup",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"),
          count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"))
    },

    // Explicit GROUPING SETS (the primitive ROLLUP/CUBE desugar to): an
    // ASYMMETRIC set list neither of them can express — (flag,status),
    // (flag), (mode) — one Expand pass, grouping flags disambiguate.
    Q("q152_grouping_sets",
      """SELECT l_returnflag, l_linestatus, l_linenumber,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        |  CAST(grouping(l_linenumber) AS BIGINT) AS g_line,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), (l_linenumber))
        |""".stripMargin) { (s, d) =>
      t(s, d, "lineitem").createOrReplaceTempView("q152_lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus, l_linenumber,
          |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
          |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
          |  CAST(grouping(l_linenumber) AS BIGINT) AS g_line,
          |  count(*) AS n_rows,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          |    AS sum_qty
          |FROM q152_lineitem
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
          |  (l_returnflag), (l_linenumber))
          |""".stripMargin)
    },

    // CUBE: all four grouping combinations in one pass (rollup's superset);
    // grouping flags disambiguate subtotal NULLs.
    Q("q79_cube",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
          grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"),
          count(lit(1)).as("n_rows"))
    },

    // INTERSECT / EXCEPT: customers with vs without orders, as set ops
    // (the reference expresses the same split only via joins — q12/q13).
    Q("q63_setops",
      """SELECT c_custkey, 'active' AS status FROM
        |  (SELECT c_custkey FROM customer
        |   INTERSECT SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT c_custkey, 'inactive' AS status FROM
        |  (SELECT c_custkey FROM customer
        |   EXCEPT SELECT o_custkey FROM orders)
        |""".stripMargin) { (s, d) =>
      val cust = t(s, d, "customer").select("c_custkey")
      val ords = t(s, d, "orders").select(col("o_custkey").as("c_custkey"))
      cust.intersect(ords).withColumn("status", lit("active"))
        .unionAll(cust.except(ords).withColumn("status", lit("inactive")))
    },

    // Pivot: per-user event counts spread across event-type columns
    // (groupBy.pivot with an explicit value list — no extra distinct pass;
    // absent cells filled 0 to match the conditional-count oracle).
    Q("q64_pivot", {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val cols = types.map(t =>
        s"count(CASE WHEN event_type = '$t' THEN 1 END) AS $t")
        .mkString(",\n  ")
      s"SELECT user_id,\n  $cols\nFROM events GROUP BY user_id"
    }) { (s, d) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      t(s, d, "events")
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L, types)
    },

    // Window ranking family (rank / dense_rank / row_number / ntile) with a
    // deterministic tie-broken ordering, top-100 per group.
    Q("q70_rank",
      """WITH r AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |    row_number() OVER w AS rn, ntile(4) OVER w AS tile
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice DESC, o_orderkey))
        |SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(rnk AS BIGINT) AS rnk, CAST(drnk AS BIGINT) AS drnk,
        |  CAST(rn AS BIGINT) AS rn, CAST(tile AS BIGINT) AS tile
        |FROM r WHERE rn <= 100
        |""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          row_number().over(w).cast("long").as("rn"),
          ntile(4).over(w).cast("long").as("tile"))
        .filter(col("rn") <= 100)
    },

    // Exact linear-interpolation percentiles per group (Spark `percentile`
    // == SQL-standard PERCENTILE_CONT == DuckDB quantile_cont), Parity-
    // rounded so the double interpolation compares bit-stably.
    Q("q67_percentiles",
      s"""SELECT l_returnflag,
         |  ${Parity4("quantile_cont(l_extendedprice, 0.5)")} AS p50,
         |  ${Parity4("quantile_cont(l_extendedprice, 0.95)")} AS p95,
         |  count(*) AS n
         |FROM lineitem GROUP BY l_returnflag
         |""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          graft.core.Parity.round4(
            expr("percentile(l_extendedprice, 0.5)")).as("p50"),
          graft.core.Parity.round4(
            expr("percentile(l_extendedprice, 0.95)")).as("p95"),
          count(lit(1)).as("n"))
    },

    // KMV distinct sketch (typed Aggregator, O(k) state per group): the
    // md5-derived hashing makes even the sketch ESTIMATE deterministic, so
    // the oracle replays the exact k-minima and estimator. Exact distinct
    // alongside for context.
    Q("q72_kmv_distinct",
      s"""WITH h AS (SELECT event_type, ${hash48Sql("props")} AS h
         |           FROM events WHERE props IS NOT NULL),
         |s AS (SELECT event_type, list_sort(list_distinct(list(h))) AS hs,
         |        count(DISTINCT h) AS nd
         |      FROM h GROUP BY event_type)
         |SELECT event_type,
         |  CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
         |       ELSE CAST(63 AS DOUBLE) * CAST(281474976710656 AS DOUBLE)
         |            / CAST(hs[64] AS DOUBLE)
         |  END AS kmv_distinct,
         |  CAST(nd AS BIGINT) AS n_exact
         |FROM s
         |""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .filter(col("props").isNotNull)
        .withColumn("__h", graft.text.TextFunctions.md5Hash48(col("props")))
        .groupBy("event_type")
        .agg(
          graft.functions.KmvSketch.kmvDistinct(col("__h"), 64)
            .as("kmv_distinct"),
          count_distinct(col("__h")).as("n_exact"))
    },

    // Hash-sample quantile sketch (KmvSketch's quantile companion: O(k)
    // state per group, deterministic membership = k smallest (hash, value)
    // pairs, PERCENTILE_CONT over the sample). The oracle replays the
    // identical sample via ROW_NUMBER <= k and the identical interpolation
    // expression — an approximate operator with an EXACT oracle.
    Q("q118_quantile_sketch",
      s"""WITH h AS (SELECT event_type, value,
         |    ${hash48Sql("CAST(event_id AS VARCHAR)")} AS hv
         |  FROM events WHERE value IS NOT NULL),
         |s AS (SELECT event_type, value, ROW_NUMBER() OVER (
         |    PARTITION BY event_type ORDER BY hv, value) AS rn FROM h),
         |kk AS (SELECT event_type, value FROM s WHERE rn <= 512),
         |v AS (SELECT event_type, value, ROW_NUMBER() OVER (
         |      PARTITION BY event_type ORDER BY value) - 1 AS vi,
         |    COUNT(*) OVER (PARTITION BY event_type) AS n FROM kk),
         |q AS (SELECT event_type, n,
         |    MAX(CASE WHEN vi = CAST(floor(0.5 * (n-1)) AS BIGINT)
         |        THEN value END) AS lo50,
         |    MAX(CASE WHEN vi = CAST(ceil(0.5 * (n-1)) AS BIGINT)
         |        THEN value END) AS hi50,
         |    MAX(CASE WHEN vi = CAST(floor(0.95 * (n-1)) AS BIGINT)
         |        THEN value END) AS lo95,
         |    MAX(CASE WHEN vi = CAST(ceil(0.95 * (n-1)) AS BIGINT)
         |        THEN value END) AS hi95
         |  FROM v GROUP BY event_type, n)
         |SELECT event_type,
         |  ${Parity4("lo50 + (hi50 - lo50) * (0.5 * (n-1) - floor(0.5 * (n-1)))")}
         |    AS p50_sketch,
         |  ${Parity4("lo95 + (hi95 - lo95) * (0.95 * (n-1) - floor(0.95 * (n-1)))")}
         |    AS p95_sketch
         |FROM q
         |""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .filter(col("value").isNotNull)
        .withColumn("__h",
          graft.text.TextFunctions.md5Hash48(col("event_id").cast("string")))
        .groupBy("event_type")
        .agg(graft.functions.QuantileSketch.sketchQuantiles(
          col("__h"), col("value"), 512, Seq(0.5, 0.95)).as("__q"))
        .select(col("event_type"),
          graft.core.Parity.round4(col("__q").getItem(0)).as("p50_sketch"),
          graft.core.Parity.round4(col("__q").getItem(1)).as("p95_sketch"))
    },

    // UNPIVOT (melt): wide measures → long (metric, val) — the standard
    // reshape before per-metric aggregation/feature pipelines. Pure
    // projection+explode (one output row per (row, metric)), no shuffle.
    Q("q146_unpivot",
      """WITH li AS (SELECT l_orderkey, l_linenumber,
        |    CAST(l_quantity AS DOUBLE) AS q,
        |    CAST(l_extendedprice AS DOUBLE) AS ep,
        |    CAST(l_discount AS DOUBLE) AS di,
        |    CAST(l_tax AS DOUBLE) AS tx
        |  FROM lineitem WHERE l_orderkey % 10 = 0)
        |SELECT l_orderkey, l_linenumber, 'quantity' AS metric, q AS val
        |  FROM li
        |UNION ALL SELECT l_orderkey, l_linenumber, 'extendedprice', ep
        |  FROM li
        |UNION ALL SELECT l_orderkey, l_linenumber, 'discount', di FROM li
        |UNION ALL SELECT l_orderkey, l_linenumber, 'tax', tx FROM li
        |""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_orderkey") % 10 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("quantity"),
          col("l_extendedprice").cast("double").as("extendedprice"),
          col("l_discount").cast("double").as("discount"),
          col("l_tax").cast("double").as("tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("quantity"), col("extendedprice"), col("discount"),
            col("tax")),
          "metric", "val")
    },

    // Offset/distribution window analytics in one pass: lag/lead,
    // first_value, percent_rank, cume_dist share a single window spec →
    // Catalyst plans ONE WindowExec (one shuffle+sort on the key). The
    // rank ratios are IEEE divisions of identical integers on both
    // engines, Parity-rounded for bit-stable compare.
    Q("q147_window_analytics",
      s"""WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         |              value FROM events)
         |SELECT user_id, event_id,
         |  lag(value) OVER w AS prev_value,
         |  lead(value) OVER w AS next_value,
         |  first_value(event_id) OVER w AS first_event,
         |  ${Parity4("percent_rank() OVER w")} AS pr,
         |  ${Parity4("cume_dist() OVER w")} AS cd
         |FROM ev
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"),
          first(col("event_id")).over(w).as("first_event"),
          graft.core.Parity.round4(percent_rank().over(w)).as("pr"),
          graft.core.Parity.round4(cume_dist().over(w)).as("cd"))
    })

  private def Parity4(e: String): String = graft.core.Parity.round4Sql(e)

  /** DuckDB mirror of TextFunctions.md5Hash48. */
  private def hash48Sql(x: String): String =
    s"('0x' || substr(md5($x), 1, 12))::BIGINT"
}
