package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic rounding.
  *
  * `round(x, n)` is NOT portable between engines when x sits on a half
  * boundary: DuckDB multiplies by 10^n (snapping e.g. 237778.854999... to
  * 23777885.5) and rounds half-away, while Spark rounds the exact decimal
  * expansion of the double — opposite results for the same input bits.
  * `floor(x * 10^n + 0.5) / 10^n` uses only IEEE-deterministic ops, so given
  * bit-identical input (guaranteed by exact DECIMAL sums upstream) both
  * engines produce bit-identical output. The SQL-side twin must use the same
  * floor form.
  */
object Parity {
  // NB: floor(x*10^n + 0.5) rounds NEGATIVE half-boundaries toward +infinity
  // (-2.005 → -2.00), not half-away-from-zero. Cross-engine parity holds
  // (both sides use the identical form), but don't use this where standard
  // half-away semantics matter on negative-capable columns.
  def round2(c: Column): Column = floor(c * 100 + 0.5) / 100.0
  def round4(c: Column): Column = floor(c * 10000 + 0.5) / 10000.0

  /** SQL fragment producing the identical rounding in DuckDB. */
  def round2Sql(expr: String): String = s"floor(($expr) * 100 + 0.5) / 100"
  def round4Sql(expr: String): String = s"floor(($expr) * 10000 + 0.5) / 10000"
}
