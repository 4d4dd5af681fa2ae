package graft.queries

import graft.core.{Q, Tables}
import graft.operators.MergeEngine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE upsert / MERGE delete semantics (SURVEY.md §2.3 #18-#21), exercised
  * through [[graft.operators.MergeEngine]] with a deterministically derived
  * source batch so a DuckDB oracle can replay the identical semantics in SQL.
  *
  * Source derivation: customers with key % 10 == 0 get an updated balance and
  * a renamed row (matched ⇒ UPDATE SET *), customers with key % 17 == 0 are
  * re-keyed past the key space (not matched ⇒ INSERT *).
  */
object MutationQueries {
  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.table(s, d, n)

  private def upsertSource(c: DataFrame): DataFrame = {
    val updates = c.filter(col("c_custkey") % 10 === 0)
      .select(
        col("c_custkey"),
        concat(lit("upd:"), col("c_name")).as("c_name"),
        col("c_nationkey"),
        round(col("c_acctbal") + 100, 2).as("c_acctbal"),
        col("c_mktsegment"))
    val inserts = c.filter(col("c_custkey") % 17 === 0)
      .select(
        (col("c_custkey") + 1000000).as("c_custkey"),
        concat(lit("new:"), col("c_name")).as("c_name"),
        col("c_nationkey"),
        col("c_acctbal"),
        col("c_mktsegment"))
    updates.unionAll(inserts)
  }

  private val srcSql =
    """src AS (
      |  SELECT c_custkey, 'upd:' || c_name AS c_name, c_nationkey,
      |         round(c_acctbal + 100, 2) AS c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 10 = 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000, 'new:' || c_name, c_nationkey,
      |         c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 17 = 0
      |)""".stripMargin

  val all: Seq[Q] = Seq(

    // MERGE ... WHEN MATCHED UPDATE SET * WHEN NOT MATCHED INSERT *
    // (reference: src/iceberg/iceberg-cdc-load.py:130-134)
    Q("q14_merge_upsert",
      s"""WITH $srcSql
         |SELECT
         |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_custkey ELSE t.c_custkey END AS c_custkey,
         |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name ELSE t.c_name END AS c_name,
         |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_nationkey ELSE t.c_nationkey END AS c_nationkey,
         |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
         |  CASE WHEN s.c_custkey IS NOT NULL THEN s.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment
         |FROM customer t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
         |""".stripMargin) { (s, d) =>
      val c = t(s, d, "customer")
      MergeEngine.upsert(c, upsertSource(c), Seq("c_custkey"))
    },

    // MERGE ... WHEN MATCHED THEN DELETE
    // (reference: src/iceberg/iceberg-cdc-load.py:147-150)
    Q("q15_merge_delete",
      """SELECT t.* FROM customer t
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM customer d
        |  WHERE d.c_acctbal < 0 AND d.c_custkey = t.c_custkey)
        |""".stripMargin) { (s, d) =>
      val c = t(s, d, "customer")
      MergeEngine.delete(c, c.filter(col("c_acctbal") < 0), Seq("c_custkey"))
    })
}
