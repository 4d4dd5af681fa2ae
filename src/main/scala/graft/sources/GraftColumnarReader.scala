package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, VectorizedParquetRecordReader}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String

/** COLUMNAR executor-side reader: one parquet data file → [[ColumnarBatch]]es
  * of the requested projection, via Spark's own vectorized parquet reader —
  * the same decode path `spark.read.parquet` uses, so a bulk scan through the
  * connector pays columnar-batch decode cost (whole row groups into column
  * vectors) instead of one heap `Group` object per row (5–10× on wide scans;
  * the row-oriented [[GraftPartitionReader]] remains as the opt-out,
  * `option("columnar","false")`).
  *
  * The reference's formats all serve Spark's vectorized columnar path when
  * read back through the format (e.g.
  * /root/reference/src/iceberg/iceberg-cdc-load.py:85-93); this closes the
  * same gap for graft tables.
  *
  * Constant columns — hive partition values reconstructed from the file path
  * and the `_file` metadata column — ride in as `ConstantColumnVector`s via
  * `initBatch`'s partition-column mechanism (zero per-row cost). Columns the
  * file predates (schema evolution) are null vectors, handled natively by the
  * vectorized reader; lossless type widening (INT32 file → LongType table
  * etc.) uses the reader's widening updaters, the same machinery Spark's own
  * type-widening feature relies on.
  *
  * The vectorized reader appends partition columns AFTER the data columns;
  * DSv2 requires batches in `readSchema()` order, so the returned batch is a
  * cheap permutation wrapper over the reader's (vectors are reused across
  * batches — only `numRows` changes per batch).
  */
final class GraftColumnarPartitionReader(
    filePath: String, required: StructType,
    partitionValues: Map[String, String], capacity: Int,
    /** Pushed source filters (LOGICAL names) + logical→physical mapping,
      * for ROW-GROUP skipping via parquet's stats filter. Pruning-only:
      * every filter stays residual above the scan, and conversion declines
      * per file on any type mismatch ([[ParquetRowGroupFilter]]). */
    filters: Seq[org.apache.spark.sql.sources.Filter] = Nil,
    nameMapping: Map[String, String] = Map.empty,
    /** Files below this size skip the row-group-filter footer read — one
      * small row group decodes for less than the extra metadata roundtrip
      * costs. Tests lower it to exercise the path on small fixtures. */
    rowGroupFilterMinBytes: Long = 4L << 20)
  extends org.apache.spark.sql.connector.read.PartitionReader[ColumnarBatch] {

  /** Constant-valued fields: hive partition values win over file content
    * (hive layouts do not store the column physically); `_file` is constant
    * by construction. Everything else — including evolved-in columns absent
    * from this file — is the vectorized reader's job. */
  private val isConst: Array[Boolean] = required.fields.map(f =>
    partitionValues.contains(f.name) || f.name == GraftTable.FileColumnName)

  private val dataSchema = StructType(
    required.fields.zip(isConst).collect { case (f, false) => f })
  private val constSchema = StructType(
    required.fields.zip(isConst).collect { case (f, true) => f })

  private val constRow: InternalRow = new GenericInternalRow(
    constSchema.fields.map { f =>
      if (f.name == GraftTable.FileColumnName) UTF8String.fromString(filePath)
      else GraftColumnarPartitionReader.parsePartitionValue(
        partitionValues(f.name), f.dataType)
    }.toArray[Any])

  private val reader: VectorizedParquetRecordReader = {
    val conf = new Configuration()
    conf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, dataSchema.json)
    conf.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[ParquetReadSupport].getName)
    // schema-converter flags the vectorized reader resolves from the conf
    // (Spark's own scan exec copies these from the session; an executor-side
    // connector reader must set them explicitly)
    conf.set(SQLConf.PARQUET_BINARY_AS_STRING.key, "false")
    conf.set(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key, "true")
    conf.set(SQLConf.CASE_SENSITIVE.key, "false")
    conf.set(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key, "true")
    conf.set(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key, "false")
    // ROW-GROUP skipping: convert the pushed filters against THIS file's
    // footer schema (one cheap metadata read; declines on any per-file
    // type mismatch, e.g. a pre-widening INT32 column under a BIGINT
    // predicate) and hand parquet the stats-only predicate — whole row
    // groups a selective clustered predicate can't reach are never
    // decoded. The base reader picks it up via ParquetInputFormat.
    // Size-gated: a small file is one small row group, where decode costs
    // less than the extra footer roundtrip — engage only where whole-group
    // (or whole-file, via footer stats on columns the MANIFEST doesn't
    // stat) skipping can actually pay.
    if (filters.nonEmpty &&
        java.nio.file.Files.size(
          java.nio.file.Paths.get(filePath)) >= rowGroupFilterMinBytes) {
      val fileSchema = {
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(filePath), conf))
        try r.getFooter.getFileMetaData.getSchema finally r.close()
      }
      ParquetRowGroupFilter.predicateFor(fileSchema, filters, nameMapping)
        .foreach(p => org.apache.parquet.hadoop.ParquetInputFormat
          .setFilterPredicate(conf, p))
    }
    // CORRECTED = no calendar rebase: every graft-readable file is written by
    // Spark 3+/parquet-hadoop with proleptic-Gregorian semantics (the same
    // assumption the row-oriented reader makes)
    val r = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC", false, capacity)
    // the mapred FileSplit (which extends the mapreduce one) — Spark's base
    // reader casts to it
    val split = new org.apache.hadoop.mapred.FileSplit(
      new org.apache.hadoop.fs.Path(filePath), 0,
      java.nio.file.Files.size(java.nio.file.Paths.get(filePath)),
      Array.empty[String])
    try {
      r.initialize(split, new TaskAttemptContextImpl(conf, new TaskAttemptID()))
      r.initBatch(constSchema, constRow)
      r.enableReturningBatches()
    } catch { case t: Throwable => r.close(); throw t }
    r
  }

  /** Reader batch order = dataSchema ++ constSchema; permute to `required`. */
  private val permuted: ColumnarBatch = {
    val src = reader.resultBatch()
    var d = 0
    var c = 0
    val vectors = required.fields.indices.map { i =>
      if (isConst(i)) { c += 1; src.column(dataSchema.length + c - 1) }
      else { d += 1; src.column(d - 1) }
    }.toArray
    new ColumnarBatch(vectors, 0)
  }

  override def next(): Boolean = {
    val has = reader.nextKeyValue()
    if (has) permuted.setNumRows(
      reader.getCurrentValue.asInstanceOf[ColumnarBatch].numRows())
    has
  }

  override def get(): ColumnarBatch = permuted

  override def close(): Unit = reader.close()
}

object GraftColumnarPartitionReader {
  /** Hive partition segment value → Catalyst constant of the declared type
    * (shared with the row-oriented reader — the manifest schema re-types what
    * the path stores as text). */
  private[sources] def parsePartitionValue(raw: String, dt: DataType): Any =
    if (raw == "__HIVE_DEFAULT_PARTITION__") null
    else dt match {
      case StringType => UTF8String.fromString(raw)
      case IntegerType => raw.toInt
      case LongType => raw.toLong
      case ShortType => raw.toShort
      case ByteType => raw.toByte
      case DoubleType => raw.toDouble
      case FloatType => raw.toFloat
      case BooleanType => raw.toBoolean
      case DateType => DateTimeUtils.fromJavaDate(java.sql.Date.valueOf(raw))
      // micros-since-epoch text — the synthetic `_commit_timestamp` CDF
      // constant. Genuine timestamp PARTITION keys remain unsupported
      // (their hive path rendering is formatted text, not micros) and must
      // fail with a nameable error, not a bare NumberFormatException.
      case TimestampType =>
        try raw.toLong
        catch {
          case _: NumberFormatException =>
            throw new UnsupportedOperationException(
              s"graft reader: timestamp PARTITION columns are not " +
                s"supported (got path value '$raw'; only micros-encoded " +
                "change-feed constants are) — partition on a date or " +
                "string column instead")
        }
      case d: DecimalType => Decimal(BigDecimal(raw), d.precision, d.scale)
      case other => throw new UnsupportedOperationException(
        s"graft reader: partition column type ${other.simpleString}")
    }
}
