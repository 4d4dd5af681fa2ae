package graft.queries

import graft.core.{Parity, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.5 #26-#33): date math, CASE
  * labeling, conditional aggregation, ratio projection, plus the
  * string/math/json/timestamp built-ins a lake query layer needs. All stay in
  * `org.apache.spark.sql.functions` (whole-stage-codegen'd) — no UDFs.
  */
object FunctionQueries {
  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.table(s, d, n)

  val all: Seq[Q] = Seq(

    // §2.5 #30 conditional aggregation (manual pivot)
    // (reference: src/sample_redshift_ml_sql_query.txt:41-46)
    Q("q16_conditional_agg",
      """SELECT user_id,
        |  CAST(sum(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END AS DECIMAL(28,10))) AS DOUBLE) AS purchase_value,
        |  CAST(sum(CAST(CASE WHEN event_type = 'click' THEN value ELSE 0 END AS DECIMAL(28,10))) AS DOUBLE) AS click_value,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
        |  count(*) AS n_events
        |FROM events GROUP BY user_id
        |""".stripMargin) { (s, d) =>
      t(s, d, "events").groupBy("user_id").agg(
        sum(when(col("event_type") === "purchase", col("value"))
          .otherwise(0).cast("decimal(28,10)")).cast("double")
          .as("purchase_value"),
        sum(when(col("event_type") === "click", col("value"))
          .otherwise(0).cast("decimal(28,10)")).cast("double")
          .as("click_value"),
        count(when(col("event_type") === "error", lit(1))).as("n_errors"),
        count(lit(1)).as("n_events"))
    },

    // §2.5 #27 CASE WHEN churn labeling
    // (reference: src/sample_redshift_ml_sql_query.txt:20)
    Q("q17_churn_label",
      """SELECT user_id,
        |  CASE WHEN date_diff('day', CAST(last_ts AS DATE), DATE '2024-01-31') > 14
        |       THEN 'True' ELSE 'False' END AS churn
        |FROM (SELECT user_id, max(ts) AS last_ts FROM events GROUP BY user_id) x
        |""".stripMargin) { (s, d) =>
      t(s, d, "events").groupBy("user_id").agg(max("ts").as("last_ts"))
        .select(col("user_id"),
          when(datediff(to_date(lit("2024-01-31")), to_date(col("last_ts"))) > 14,
            "True").otherwise("False").as("churn"))
    },

    // §2.5 #26 scalar date math (reference: src/sample_redshift_ml_sql_query.txt:15,19)
    Q("q18_date_math",
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT) AS days_to_eoy,
        |  CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |  CAST(month(o_orderdate) AS BIGINT) AS order_month
        |FROM orders
        |""".stripMargin) { (s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"),
        datediff(to_date(lit("1998-12-31")), to_date(col("o_orderdate")))
          .cast("long").as("days_to_eoy"),
        year(col("o_orderdate")).cast("long").as("order_year"),
        month(col("o_orderdate")).cast("long").as("order_month"))
    },

    // §2.5 #33 derived-ratio projection
    // (reference: src/sample_redshift_ml_sql_query.txt:87-94)
    Q("q19_ratio",
      s"""SELECT o_custkey,
         |  ${Parity.round2Sql("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)")}
         |    AS avg_order_value,
         |  count(*) AS n_orders
         |FROM orders GROUP BY o_custkey
         |""".stripMargin) { (s, d) =>
      // Sum as DECIMAL so the aggregate is exact (immune to fp ordering
      // across partitions), then one IEEE double division + Parity rounding —
      // bit-identical to the sequential oracle even on .xx5 half boundaries.
      t(s, d, "orders").groupBy("o_custkey").agg(
        Parity.round2(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("avg_order_value"),
        count(lit(1)).as("n_orders"))
    },

    // JSON extraction over the events props column (semi-structured payloads
    // are table stakes for an events lake; codegen'd GetJsonObject)
    Q("q20_json_extract",
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events
        |""".stripMargin) { (s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
    },

    // string functions
    Q("q21_string_funcs",
      """SELECT c_custkey, upper(c_name) AS name_upper,
        |  lower(c_mktsegment) AS seg_lower,
        |  substr(c_name, 1, 8) AS name_prefix,
        |  CAST(length(c_name) AS BIGINT) AS name_len,
        |  concat(c_mktsegment, ':', c_name) AS tagged
        |FROM customer
        |""".stripMargin) { (s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        lower(col("c_mktsegment")).as("seg_lower"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        length(col("c_name")).cast("long").as("name_len"),
        concat(col("c_mktsegment"), lit(":"), col("c_name")).as("tagged"))
    },

    // math functions (IEEE-exact ops; sqrt/ln rounded via Parity — plain
    // round(x,4) is the cross-engine half-boundary hazard Parity documents)
    Q("q22_math_funcs",
      s"""SELECT l_orderkey, l_linenumber,
         |  ${Parity.round4Sql("sqrt(l_extendedprice)")} AS sqrt_price,
         |  CAST(floor(l_quantity) AS BIGINT) AS q_floor,
         |  CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct,
         |  abs(l_tax - CAST(0.04 AS DOUBLE)) AS tax_dev,
         |  ${Parity.round4Sql("ln(l_extendedprice)")} AS ln_price
         |FROM lineitem
         |""".stripMargin) { (s, d) =>
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        Parity.round4(sqrt(col("l_extendedprice"))).as("sqrt_price"),
        floor(col("l_quantity")).as("q_floor"),
        ceil(col("l_discount") * 100).as("disc_pct"),
        abs(col("l_tax") - 0.04).as("tax_dev"),
        Parity.round4(log(col("l_extendedprice"))).as("ln_price"))
    },

    // §2.2 #8 timestamp cast + calendar extraction
    // (reference: src/hudi/hudi-cdc-load.py:76)
    Q("q23_ts_extract",
      """SELECT event_id,
        |  CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS m,
        |  CAST(day(ts) AS BIGINT) AS d, CAST(hour(ts) AS BIGINT) AS h,
        |  CAST(minute(ts) AS BIGINT) AS mi
        |FROM events
        |""".stripMargin) { (s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        year(col("ts")).cast("long").as("y"),
        month(col("ts")).cast("long").as("m"),
        dayofmonth(col("ts")).cast("long").as("d"),
        hour(col("ts")).cast("long").as("h"),
        minute(col("ts")).cast("long").as("mi"))
    },

    // §2.5 #32 timestamp range filter (partition/predicate pushdown shape)
    // (reference: src/sample_redshift_ml_sql_query.txt:97)
    Q("q24_range_filter",
      """WITH ev AS (SELECT event_id, user_id, value,
        |  CAST(ts AS TIMESTAMP) AS ts FROM events)
        |SELECT event_id, user_id, ts, value FROM ev
        |WHERE ts > TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-20 00:00:00'
        |""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .filter(col("ts") > lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-20 00:00:00").cast("timestamp"))
        .select("event_id", "user_id", "ts", "value")
    })
}
