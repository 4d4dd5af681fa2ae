package graft.storage

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{expr, lit}
import org.apache.spark.sql.types.StructField

/** INITIAL-DEFAULT plumbing for [[CowTable.addColumn]] — the Spark-native
  * `EXISTS_DEFAULT`/`CURRENT_DEFAULT` field-metadata convention (what
  * Spark's own v1 sources and the vectorized parquet reader consume;
  * Iceberg V3 records the same concept as a schema initial-default).
  * `EXISTS_DEFAULT` holds the literal FOLDED at ALTER time and is what a
  * file physically missing the column reads; `CURRENT_DEFAULT` is the
  * user's expression, resolved by Spark's analyzer for INSERTs that omit
  * the column. A stored NULL in a file that HAS the column is never
  * touched — only physical absence fills. */
private[graft] object ColumnDefaults {
  /** Spark's metadata keys (ResolveDefaultColumns' constants, inlined so
    * this stays a public-API dependency only). */
  val CurrentKey = "CURRENT_DEFAULT"
  val ExistsKey = "EXISTS_DEFAULT"

  def existsSql(f: StructField): Option[String] =
    if (f.metadata.contains(ExistsKey)) Some(f.metadata.getString(ExistsKey))
    else None

  /** Fold + validate a DEFAULT expression and render it as field metadata —
    * shared by the Scala API and the SQL catalog surface. Fails loudly on
    * parse/cast errors, non-constant expressions, and a NULL default (omit
    * the default instead: absent columns already read NULL). */
  def metadataFor(spark: org.apache.spark.sql.SparkSession, table: String,
      name: String, dt: org.apache.spark.sql.types.DataType,
      sql: String): org.apache.spark.sql.types.Metadata = {
    val df = spark.sql(s"SELECT CAST(($sql) AS ${dt.sql}) AS __default")
    val alias = df.queryExecution.analyzed.expressions.collectFirst {
      case a: org.apache.spark.sql.catalyst.expressions.Alias => a
    }.get
    // constant-FOLDABLE is the bar, checked two ways: foldable as analyzed
    // (literals, arithmetic over literals, current_date()/now() — query-
    // constant, frozen at ALTER time into EXISTS_DEFAULT), or folded to a
    // literal by the optimizer (ComputeCurrentTime + constant folding).
    // Non-deterministic expressions (rand(), uuid()) stay LOUD — the
    // optimizer never folds them and a per-row default is not a constant.
    lazy val optimizedConstant: Boolean =
      df.queryExecution.optimizedPlan.expressions.collectFirst {
        case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
      }.exists(_.foldable)
    require(alias.child.deterministic &&
        (alias.child.foldable || optimizedConstant),
      s"table $table: DEFAULT for $name must be a constant-foldable " +
        s"deterministic expression, got: $sql")
    val v = df.head().get(0)
    require(v != null,
      s"table $table: DEFAULT for $name evaluates to NULL — omit the " +
        "default instead (absent columns already read NULL)")
    val folded =
      org.apache.spark.sql.catalyst.expressions.Literal.create(v, dt)
    new org.apache.spark.sql.types.MetadataBuilder()
      .putString(CurrentKey, sql)
      .putString(ExistsKey, folded.sql)
      .build()
  }

  /** [[metadataFor]] twin for an EXPRESSION-VALUED DSv2 default that
    * carries no SQL text (the connector-API shape): accepted when it
    * reduced to a V2 literal — folded here into the same metadata, the
    * literal's rendering serving as both the current and the existence
    * default. */
  def metadataForValue(table: String, name: String,
      dt: org.apache.spark.sql.types.DataType,
      v2: org.apache.spark.sql.connector.expressions.Literal[_])
      : org.apache.spark.sql.types.Metadata = {
    // a V2 literal's value is already in Catalyst INTERNAL form
    val asDt = org.apache.spark.sql.catalyst.expressions.Cast(
      org.apache.spark.sql.catalyst.expressions.Literal(
        v2.value, v2.dataType), dt,
      Some(java.util.TimeZone.getDefault.getID))
    val v = asDt.eval(null)
    require(v != null,
      s"table $table: DEFAULT for $name evaluates to NULL — omit the " +
        "default instead (absent columns already read NULL)")
    val folded =
      org.apache.spark.sql.catalyst.expressions.Literal.create(v, dt)
    new org.apache.spark.sql.types.MetadataBuilder()
      .putString(CurrentKey, folded.sql)
      .putString(ExistsKey, folded.sql)
      .build()
  }

  /** Fill expression for a column PHYSICALLY ABSENT from the files being
    * read: its existence default when declared, else a typed null. */
  def fillExpr(f: StructField): Column =
    existsSql(f).map(expr).getOrElse(lit(null)).cast(f.dataType)

  /** The existence default as a Catalyst INTERNAL value (row readers fill
    * with it directly); null when the field declares none. Delegates to
    * Spark's own resolver so literal parsing matches the analyzer's. */
  def internalValue(f: StructField): Any =
    if (!f.metadata.contains(ExistsKey)) null
    else org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
      .getExistenceDefaultValue(f)
}
