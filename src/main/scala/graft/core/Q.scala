package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: a Spark-first implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle that the
  * driver hash-compares against. Column names/aliases MUST match between the
  * two — the driver sorts columns by name before hashing values.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  def tuple: (String, (SparkSession, String) => DataFrame) = name -> run
}

object Q {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  /** A query whose semantics aren't expressible in portable SQL — the driver
    * records a weaker rows-only check. */
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
