package graft.queries

import graft.core.{Parity, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY.md §2.1, §2.2, §2.4, §2.5): scans,
  * filters, aggregation, window, union, sort/limit, joins. Each query is the
  * Spark-first (declarative DataFrame) form so Catalyst gets pushdown /
  * pruning / join-strategy selection; the paired oracle is ANSI SQL the driver
  * runs in DuckDB on the same parquet.
  */
object CoreQueries {
  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.table(s, d, n)

  val all: Seq[Q] = Seq(

    // §2.1 #1/#2 parquet scan + projection + pushed filter
    // (reference: src/iceberg/iceberg-initial-load.py:54-55)
    Q("q01_scan_filter_project",
      """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_quantity < 10
        |""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_quantity") < 10)
        .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity",
          "l_extendedprice")
    },

    // §2.2 #11/#12 SQL-string predicate + IN-list filter
    // (reference: src/hudi/hudi-cdc-load.py:87-90)
    Q("q02_filter_in",
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_discount
        |FROM lineitem
        |WHERE l_returnflag IN ('A','R') AND l_linestatus = 'F'
        |  AND l_discount BETWEEN CAST(0.02 AS DOUBLE) AND CAST(0.08 AS DOUBLE)
        |""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_returnflag").isin("A", "R") &&
          col("l_linestatus") === "F" &&
          col("l_discount").between(0.02, 0.08))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_discount")
    },

    // §2.5 #29 hash aggregate: partial+final HashAggregateExec
    // (reference: src/sample_redshift_ml_sql_query.txt:28-32)
    Q("q03_agg_group",
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
         |  ${Parity.round2Sql("CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS DOUBLE)")} AS sum_disc_price,
         |  ${Parity.round4Sql("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)")} AS avg_qty,
         |  count(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |""".stripMargin) { (s, d) =>
      // DECIMAL sums are exact, so the aggregate is identical regardless of
      // partition/merge order; Parity rounding is then bit-reproducible
      // against the sequential oracle. (Plain double sums differ from it in
      // the last ulp and can flip round()'s half cases.)
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_base"),
          Parity.round2(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(28,10)")).cast("double")).as("sum_disc_price"),
          Parity.round4(sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
            count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
    },

    // §2.4 #23 COUNT(*) (reference: src/hudi/hudi-cdc-load.py:221-222)
    Q("q04_count_star",
      "SELECT count(*) AS cnt FROM lineitem") { (s, d) =>
      t(s, d, "lineitem").agg(count(lit(1)).as("cnt"))
    },

    // DISTINCT (dedup-by-all-columns primitive underlying §2.6 dedup ops)
    Q("q05_distinct",
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem") { (s, d) =>
      t(s, d, "lineitem").select("l_returnflag", "l_linestatus").distinct()
    },

    // §2.4 #22 global sort + top-k (reference: src/hudi/hudi-cdc-load.py:218-219)
    Q("q06_sort_limit",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
        |""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // §2.2 #13 UNION ALL (reference: src/hudi/hudi-cdc-load.py:91)
    Q("q07_union_all",
      """SELECT event_id, user_id, event_type FROM events WHERE event_type = 'signup'
        |UNION ALL
        |SELECT event_id, user_id, event_type FROM events WHERE event_type = 'purchase'
        |""".stripMargin) { (s, d) =>
      val e = t(s, d, "events").select("event_id", "user_id", "event_type")
      e.filter(col("event_type") === "signup")
        .unionAll(e.filter(col("event_type") === "purchase"))
    },

    // §2.2 #9/#10 window max over whole key partition
    // (reference: src/hudi/hudi-cdc-load.py:79-84)
    Q("q08_window_max",
      // the events CTE truncates ns→µs exactly like our reader (ADVICE: both
      // engines must see identical timestamp precision by construction)
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
        |SELECT event_id, user_id, ts,
        |  max(ts) OVER (PARTITION BY user_id) AS max_ts
        |FROM ev
        |""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .select("event_id", "user_id", "ts")
        .withColumn("max_ts",
          max(col("ts")).over(Window.partitionBy("user_id")))
    },

    // §2.2 #9-#11 the CDC dedup core: latest event per key, ties kept
    // (reference: src/hudi/hudi-cdc-load.py:79-91)
    Q("q09_cdc_latest",
      """WITH ev AS (SELECT user_id, event_id, event_type, value,
        |  CAST(ts AS TIMESTAMP) AS ts FROM events)
        |SELECT user_id, event_id, event_type, value, ts FROM (
        |  SELECT user_id, event_id, event_type, value, ts,
        |    max(ts) OVER (PARTITION BY user_id) AS max_ts
        |  FROM ev) x
        |WHERE ts = max_ts
        |""".stripMargin) { (s, d) =>
      graft.operators.CdcDedup.latestPerKey(
        t(s, d, "events").select("user_id", "event_id", "event_type", "value", "ts"),
        Seq("user_id"), "ts")
    },

    // §2.5 #31 inner equi-join
    Q("q10_join_inner",
      """SELECT o.o_orderkey, c.c_name, o.o_totalprice
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o.o_orderstatus = 'F'
        |""".stripMargin) { (s, d) =>
      val o = t(s, d, "orders").filter(col("o_orderstatus") === "F")
      val c = t(s, d, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select("o_orderkey", "c_name", "o_totalprice")
    },

    // §2.5 #31 multi-way equi-join chain + aggregate (CTAS body shape,
    // reference: src/sample_redshift_ml_sql_query.txt:54-73). Small dims are
    // broadcast (nation/region always; customer via AQE at scale).
    Q("q11_join3_agg",
      """SELECT r.r_name,
        |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name
        |""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"),
          count(lit(1)).as("n_orders"))
    },

    // anti join (the MERGE-delete physical primitive, SURVEY.md §2.3 #19)
    Q("q12_join_anti",
      """SELECT c.c_custkey, c.c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },

    // semi join (EXISTS)
    Q("q13_join_semi",
      """SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    },

    // COLUMN PROFILING (pre-ingest data-quality report): per column, row/
    // null/exact-distinct counts + native-typed min/max stringified — ONE
    // aggregate pass, unpivoted to a row per column (see
    // [[graft.operators.Profile]] for the Expand-based plan shape and the
    // KMV swap-in for very wide tables).
    Q("q135_profile_columns",
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
        .map(c =>
          s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_null,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  CAST(min($c) AS VARCHAR) AS min_value,
             |  CAST(max($c) AS VARCHAR) AS max_value
             |FROM orders""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\n")) { (s, d) =>
      graft.operators.Profile.profile(t(s, d, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
    })
}
