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

/** DELETION-VECTOR- and GENERATED-COLUMN-tolerant columnar reader: keeps
  * vectorized parquet decode for files that previously forced the whole
  * scan to row mode — a DV'd file (heavily-mutated CDC tables pay per-row
  * decode on EVERY file until purge/OPTIMIZE otherwise) or a pre-evolution
  * file needing the generated partition column derived per row.
  *
  * Delta keeps vectorization under DVs by surfacing deletions as an
  * is-row-deleted flag consumed by a residual filter; a DSv2 connector has
  * no residual-filter seam of its own, so this reader uses the sibling
  * shape: batches containing NO deleted positions pass through untouched
  * (the overwhelmingly common case — deletions cluster in few row groups),
  * and batches that do contain deletions are COMPACTED (surviving rows
  * copied into writable vectors). Row positions stay exact under row-group
  * skipping by reading surviving contiguous block runs through explicit
  * byte ranges with their footer-derived start row indexes — the same
  * math [[GraftPartitionReader]] uses (positions never drift).
  *
  * The generated partition column (partition-spec evolution) is evaluated
  * per batch into a writable vector via the driver-bound transform
  * expression; identity-on-source eras (source path-borne) collapse to a
  * per-file CONSTANT vector via the partition-column mechanism. `_pos`
  * scans stay on the row path (a running per-file position has no
  * columnar form worth building — row-level ops want rows anyway). */
final class GraftAugmentedColumnarReader(
    filePath: String, required: StructType,
    partitionValues: Map[String, String], capacity: Int,
    /** Deletion-vector ref (abs sidecar dir, root-relative file path). */
    dv: Option[(String, String)],
    /** Generated-partition-column backfill for pre-evolution files. */
    genFill: Option[GenFill],
    filters: Seq[org.apache.spark.sql.sources.Filter] = Nil,
    nameMapping: Map[String, String] = Map.empty,
    rowGroupFilterMinBytes: Long = 4L << 20)
  extends org.apache.spark.sql.connector.read.PartitionReader[ColumnarBatch] {

  import org.apache.spark.sql.execution.vectorized.{OnHeapColumnVector, WritableColumnVector}
  import org.apache.spark.sql.vectorized.ColumnVector
  import scala.jdk.CollectionConverters._

  private val hPath = new org.apache.hadoop.fs.Path(filePath)

  private val (fileSchema: org.apache.parquet.schema.MessageType,
      blocks: Seq[org.apache.parquet.hadoop.metadata.BlockMetaData]) = {
    val conf0 = new Configuration()
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hPath, conf0))
    try (r.getFooter.getFileMetaData.getSchema,
      r.getFooter.getBlocks.asScala.toSeq)
    finally r.close()
  }
  private val inFile: Set[String] =
    fileSchema.getFields.asScala.map(_.getName).toSet

  // generated-column derivation mode for THIS file (mirrors the row
  // reader's genActive): per-row from the decoded source, a per-file
  // constant when the source itself is path-borne (identity-on-source
  // era), or a null constant when the source predates the file too
  private val genActive: Option[GenFill] = genFill.filter(gf =>
    required.fieldNames.contains(gf.genName) &&
      !partitionValues.contains(gf.genName) && !inFile(gf.genName))
  private val genPerRow: Option[GenFill] = genActive.filter(gf =>
    inFile(gf.srcPhys) && !partitionValues.contains(gf.srcPhys))
  private val genConst: Option[(String, Any)] = genActive.collect {
    case gf if genPerRow.isEmpty && partitionValues.contains(gf.srcPhys) =>
      val srcRow = new GenericInternalRow(Array[Any](
        GraftColumnarPartitionReader.parsePartitionValue(
          partitionValues(gf.srcPhys), gf.srcType)))
      gf.genName -> gf.expr.eval(srcRow)
    case gf if genPerRow.isEmpty => gf.genName -> null
  }

  private val isConst: Array[Boolean] = required.fields.map(f =>
    partitionValues.contains(f.name) ||
      f.name == GraftTable.FileColumnName ||
      genConst.exists(_._1 == f.name))
  private val isGen: Array[Boolean] = required.fields.map(f =>
    genPerRow.exists(_.genName == f.name))

  private val dataFields: Seq[StructField] =
    required.fields.toSeq.zipWithIndex.collect {
      case (f, i) if !isConst(i) && !isGen(i) => f
    }
  // the transform source must decode even when the query didn't ask for
  // it — appended LAST so the required columns' reader ordinals are stable
  private val srcAppended: Boolean = genPerRow.exists(gf =>
    !dataFields.exists(_.name == gf.srcPhys))
  private val dataSchema = StructType(
    if (srcAppended)
      dataFields :+ StructField(genPerRow.get.srcPhys, genPerRow.get.srcType)
    else dataFields)
  private val constSchema = StructType(
    required.fields.toSeq.zipWithIndex.collect {
      case (f, i) if isConst(i) => f
    })
  private val constRow: InternalRow = new GenericInternalRow(
    constSchema.fields.map { f =>
      if (f.name == GraftTable.FileColumnName) UTF8String.fromString(filePath)
      else if (genConst.exists(_._1 == f.name)) genConst.get._2
      else GraftColumnarPartitionReader.parsePartitionValue(
        partitionValues(f.name), f.dataType)
    }.toArray[Any])

  private val conf = {
    val c = new Configuration()
    c.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, dataSchema.json)
    c.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[ParquetReadSupport].getName)
    c.set(SQLConf.PARQUET_BINARY_AS_STRING.key, "false")
    c.set(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key, "true")
    c.set(SQLConf.CASE_SENSITIVE.key, "false")
    c.set(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key, "true")
    c.set(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key, "false")
    c
  }

  private val fileSize: Long =
    java.nio.file.Files.size(java.nio.file.Paths.get(filePath))

  /** Row-group runs to read: position-exact skipping when the pushed
    * filters convert (NEVER via the conf predicate — the inner reader
    * would then skip groups without telling us where the batches start),
    * one whole-file run otherwise. */
  private val allRuns: Vector[(Long, Long, Long)] =
    (if (filters.nonEmpty && fileSize >= rowGroupFilterMinBytes)
      ParquetRowGroupFilter.survivingRuns(
        fileSchema, blocks, filters, nameMapping)
    else None).getOrElse(Vector((0L, 0L, fileSize)))

  /** Deleted positions for THIS file, sorted for range slicing. */
  private val deleted: Array[Long] = dv.fold(Array.empty[Long]) {
    case (dirAbs, rel) =>
      val hs = DvSidecar.positions(dirAbs, rel)
      val a = new Array[Long](hs.size)
      var i = 0
      val it = hs.iterator()
      while (it.hasNext) { a(i) = it.next(); i += 1 }
      java.util.Arrays.sort(a)
      a
  }

  private var runIdx = -1
  private var inner: VectorizedParquetRecordReader = null
  private var nextRowPos: Long = 0L

  // ---- per-run wrappers (inner vectors change per run) ----
  private var passBatch: ColumnarBatch = null
  /** Per required index: the inner reader's vector serving it, null for
    * the per-row generated column. */
  private var innerFor: Array[ColumnVector] = null
  private var srcVector: ColumnVector = null // transform source, if per-row

  private val genIdx: Int = genPerRow.fold(-1)(gf =>
    required.fieldNames.indexOf(gf.genName))
  private val genVector: OnHeapColumnVector =
    if (genIdx >= 0) new OnHeapColumnVector(capacity,
      required.fields(genIdx).dataType) else null

  /** Writable compaction targets, one per non-const required column —
    * allocated on first use (scans of files whose deletions never
    * intersect a surviving batch pay nothing). */
  private var compactVectors: Array[OnHeapColumnVector] = null
  private var compactBatch: ColumnarBatch = null

  private def openRun(i: Int): Unit = {
    val (startRow, lo, hi) = allRuns(i)
    val r = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC", false, capacity)
    val split = new org.apache.hadoop.mapred.FileSplit(
      hPath, lo, hi - lo, Array.empty[String])
    try {
      r.initialize(split, new TaskAttemptContextImpl(conf, new TaskAttemptID()))
      r.initBatch(constSchema, constRow)
      r.enableReturningBatches()
    } catch { case t: Throwable => r.close(); throw t }
    if (inner != null) inner.close()
    inner = r
    nextRowPos = startRow
    // rebuild the pass-through permutation over THIS run's vectors
    val src = r.resultBatch()
    var d = 0
    var c = 0
    innerFor = required.fields.indices.map { i =>
      if (isGen(i)) null
      else if (isConst(i)) { c += 1; src.column(dataSchema.length + c - 1) }
      else { d += 1; src.column(d - 1) }
    }.toArray
    srcVector = genPerRow.fold(null: ColumnVector) { gf =>
      val sIdx = dataSchema.fieldNames.indexOf(gf.srcPhys)
      src.column(sIdx)
    }
    passBatch = new ColumnarBatch(required.fields.indices.map(i =>
      if (isGen(i)) genVector: ColumnVector else innerFor(i)).toArray, 0)
    if (compactBatch != null) rebuildCompactBatch()
  }

  private def rebuildCompactBatch(): Unit =
    compactBatch = new ColumnarBatch(required.fields.indices.map { i =>
      if (isConst(i)) innerFor(i)
      else compactVectors(i): ColumnVector
    }.toArray, 0)

  private def ensureCompact(): Unit = if (compactVectors == null) {
    compactVectors = required.fields.zipWithIndex.map { case (f, i) =>
      if (isConst(i)) null
      else new OnHeapColumnVector(capacity, f.dataType)
    }.toArray
    rebuildCompactBatch()
  }

  // ---- typed value movement, resolved once per column ----

  /** Copy one value between vectors; nulls handled by the caller. */
  private def copier(dt: DataType)
      : (ColumnVector, Int, WritableColumnVector, Int) => Unit = dt match {
    case BooleanType => (s, si, d, di) => d.putBoolean(di, s.getBoolean(si))
    case ByteType => (s, si, d, di) => d.putByte(di, s.getByte(si))
    case ShortType => (s, si, d, di) => d.putShort(di, s.getShort(si))
    case IntegerType | DateType =>
      (s, si, d, di) => d.putInt(di, s.getInt(si))
    case LongType | TimestampType | TimestampNTZType =>
      (s, si, d, di) => d.putLong(di, s.getLong(si))
    case FloatType => (s, si, d, di) => d.putFloat(di, s.getFloat(si))
    case DoubleType => (s, si, d, di) => d.putDouble(di, s.getDouble(si))
    case StringType => (s, si, d, di) => {
      val u = s.getUTF8String(si)
      d.putByteArray(di, u.getBytes)
    }
    case BinaryType => (s, si, d, di) => d.putByteArray(di, s.getBinary(si))
    case t: DecimalType => (s, si, d, di) =>
      d.putDecimal(di, s.getDecimal(si, t.precision, t.scale), t.precision)
    case other => throw new UnsupportedOperationException(
      s"graft columnar compaction: unsupported type ${other.simpleString}")
  }
  private val copiers
      : Array[(ColumnVector, Int, WritableColumnVector, Int) => Unit] =
    required.fields.zipWithIndex.map { case (f, i) =>
      if (isConst(i) || isGen(i)) null else copier(f.dataType)
    }.toArray

  /** Transform-source vector → Catalyst value (for expr.eval). */
  private val srcGetter: (ColumnVector, Int) => Any =
    genPerRow.fold(null: (ColumnVector, Int) => Any) { gf =>
      gf.srcType match {
        case BooleanType => (v, i) => v.getBoolean(i)
        case ByteType => (v, i) => v.getByte(i)
        case ShortType => (v, i) => v.getShort(i)
        case IntegerType | DateType => (v, i) => v.getInt(i)
        case LongType | TimestampType | TimestampNTZType =>
          (v, i) => v.getLong(i)
        case FloatType => (v, i) => v.getFloat(i)
        case DoubleType => (v, i) => v.getDouble(i)
        case StringType => (v, i) => v.getUTF8String(i)
        case t: DecimalType => (v, i) => v.getDecimal(i, t.precision, t.scale)
        case other => throw new UnsupportedOperationException(
          s"graft columnar GenFill: unsupported source ${other.simpleString}")
      }
    }

  /** Catalyst value → writable vector (the transform's output). */
  private val genWriter: (WritableColumnVector, Int, Any) => Unit =
    if (genIdx < 0) null
    else required.fields(genIdx).dataType match {
      case BooleanType => (d, i, v) => d.putBoolean(i, v.asInstanceOf[Boolean])
      case ByteType => (d, i, v) => d.putByte(i, v.asInstanceOf[Byte])
      case ShortType => (d, i, v) => d.putShort(i, v.asInstanceOf[Short])
      case IntegerType | DateType =>
        (d, i, v) => d.putInt(i, v.asInstanceOf[Int])
      case LongType | TimestampType | TimestampNTZType =>
        (d, i, v) => d.putLong(i, v.asInstanceOf[Long])
      case FloatType => (d, i, v) => d.putFloat(i, v.asInstanceOf[Float])
      case DoubleType => (d, i, v) => d.putDouble(i, v.asInstanceOf[Double])
      case StringType => (d, i, v) =>
        d.putByteArray(i, v.asInstanceOf[UTF8String].getBytes)
      case t: DecimalType => (d, i, v) =>
        d.putDecimal(i, v.asInstanceOf[org.apache.spark.sql.types.Decimal],
          t.precision)
      case other => throw new UnsupportedOperationException(
        s"graft columnar GenFill: unsupported output ${other.simpleString}")
    }
  private val genRow: GenericInternalRow =
    if (genPerRow.isDefined) new GenericInternalRow(1) else null

  private def evalGen(srcIdx: Int): Any = {
    val gf = genPerRow.get
    genRow.update(0,
      if (srcVector.isNullAt(srcIdx)) null else srcGetter(srcVector, srcIdx))
    gf.expr.eval(genRow)
  }

  /** First index in `deleted` with value >= p. */
  private def lowerBound(p: Long): Int = {
    var lo = 0
    var hi = deleted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (deleted(mid) < p) lo = mid + 1 else hi = mid
    }
    lo
  }

  private var out: ColumnarBatch = null

  override def next(): Boolean = {
    while (true) {
      if (inner == null || !inner.nextKeyValue()) {
        if (runIdx + 1 >= allRuns.length) return false
        runIdx += 1
        openRun(runIdx)
      } else {
        val n = inner.getCurrentValue.asInstanceOf[ColumnarBatch].numRows()
        val start = nextRowPos
        nextRowPos += n
        val dLo = lowerBound(start)
        val dHi = lowerBound(start + n)
        if (dLo == dHi) {
          // no deletions in this batch: pass the reader's vectors through
          if (genIdx >= 0) {
            genVector.reset()
            var r = 0
            while (r < n) {
              val v = evalGen(r)
              if (v == null) genVector.putNull(r)
              else genWriter(genVector, r, v)
              r += 1
            }
          }
          passBatch.setNumRows(n)
          out = passBatch
          return true
        }
        val survivors = n - (dHi - dLo)
        if (survivors > 0) {
          ensureCompact()
          var i = 0
          while (i < copiers.length) {
            if (compactVectors(i) != null) compactVectors(i).reset()
            i += 1
          }
          var sRow = 0
          var dRow = 0
          var dPtr = dLo
          while (sRow < n) {
            if (dPtr < dHi && deleted(dPtr) == start + sRow) dPtr += 1
            else {
              var c = 0
              while (c < copiers.length) {
                if (isGen(c)) {
                  val v = evalGen(sRow)
                  if (v == null) compactVectors(c).putNull(dRow)
                  else genWriter(compactVectors(c), dRow, v)
                } else if (!isConst(c)) {
                  if (innerFor(c).isNullAt(sRow))
                    compactVectors(c).putNull(dRow)
                  else copiers(c)(innerFor(c), sRow, compactVectors(c), dRow)
                }
                c += 1
              }
              dRow += 1
            }
            sRow += 1
          }
          compactBatch.setNumRows(survivors)
          out = compactBatch
          return true
        }
        // every row of this batch deleted: read the next one
      }
    }
    false
  }

  override def get(): ColumnarBatch = out

  override def close(): Unit = {
    if (inner != null) inner.close()
    if (genVector != null) genVector.close()
    if (compactVectors != null)
      compactVectors.foreach(v => if (v != null) v.close())
  }
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
