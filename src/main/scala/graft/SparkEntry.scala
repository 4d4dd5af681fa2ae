package graft

import graft.core.Q
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every implemented engine query (one per SURVEY.md §2 operator). */
  def allQueries: Seq[Q] =
    graft.queries.CoreQueries.all ++
      graft.queries.MutationQueries.all ++
      graft.queries.FunctionQueries.all ++
      graft.queries.StorageQueries.all ++
      graft.queries.SqlSurfaceQueries.all ++
      graft.queries.TextQueries.all ++
      graft.queries.EmbeddingQueries.all ++
      graft.queries.MultimodalQueries.all ++
      graft.queries.SourceFormatQueries.all ++
      graft.queries.TemporalQueries.all ++
      graft.queries.SetAggQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q11_join3_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(_.tuple).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
