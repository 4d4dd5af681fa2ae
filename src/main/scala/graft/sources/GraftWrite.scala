package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.util.Try

import graft.storage.{CowTable, TableConfig}
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.parquet.schema.Type.Repetition
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._

/** DSv2 WRITE path for graft tables — what makes `INSERT INTO` / `INSERT
  * OVERWRITE` / `df.write.format("graft").mode(...)` work against a
  * `USING graft` table, the writer surface the reference reaches through its
  * format connectors (reference: src/delta/delta-initial-load.py:61-78 path
  * write, src/hudi/hudi-cdc-load.py:115-157 format writer).
  *
  * Executor tasks write parquet data files straight into a WRITER-UNIQUE
  * version directory (`v{parent+1}-<token>/`, the same convention
  * [[CowTable.writeVersion]] uses); the driver's commit stats the written
  * footers (O(files) metadata, zero data re-scanned) and publishes the new
  * version through [[CowTable.commitAt]]'s hard-link CAS. Two concurrent
  * DSv2 writers therefore race exactly like two API writers: one commits,
  * the other throws ConcurrentWriteException having left only unreferenced
  * files (asserted in GraftWriteSpec).
  *
  * Files are written with the PUBLIC parquet-hadoop example API (the write
  * twin of [[GraftPartitionReader]]) — flat primitive schemas only, matching
  * the connector's documented read constraint. Partition-keyed tables get
  * their partition column stored physically (no hive directories): the read
  * path conforms either layout, and manifest-level partition pruning simply
  * keeps physical-column files (stats-absent ⇒ kept, never skipped).
  */
object GraftParquetIO {

  /** Smallest byte width whose two's complement can hold any `precision`-
    * digit unscaled value (the standard parquet fixed-len decimal sizing). */
  private def minBytesForPrecision(precision: Int): Int = {
    var n = 1
    while (!BigInt(10).pow(precision).-(1).abs
      .<(BigInt(2).pow(8 * n - 1))) n += 1
    n
  }

  /** Parquet schema for a flat Catalyst schema; loud rejection otherwise
    * (mirrors the read-side constraint in [[GraftScanBuilder.build]]). */
  def messageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val rep = if (f.nullable) Repetition.OPTIONAL else Repetition.REQUIRED
      import LogicalTypeAnnotation._
      val t = f.dataType match {
        case BooleanType => Types.primitive(BOOLEAN, rep)
        case ByteType => Types.primitive(INT32, rep).as(intType(8, true))
        case ShortType => Types.primitive(INT32, rep).as(intType(16, true))
        case IntegerType => Types.primitive(INT32, rep)
        case LongType => Types.primitive(INT64, rep)
        case FloatType => Types.primitive(FLOAT, rep)
        case DoubleType => Types.primitive(DOUBLE, rep)
        case StringType => Types.primitive(BINARY, rep).as(stringType())
        case BinaryType => Types.primitive(BINARY, rep)
        case DateType => Types.primitive(INT32, rep).as(dateType())
        case TimestampType => Types.primitive(INT64, rep)
          .as(timestampType(true, TimeUnit.MICROS))
        case TimestampNTZType => Types.primitive(INT64, rep)
          .as(timestampType(false, TimeUnit.MICROS))
        // decimal physical layout mirrors Spark's own writer (the vectorized
        // reader requires it: <=18-digit decimals live in int/long vectors
        // that cannot take BINARY pages): INT32 / INT64 unscaled when they
        // fit, fixed-len big-endian bytes otherwise
        case d: DecimalType if d.precision <= 9 =>
          Types.primitive(INT32, rep).as(decimalType(d.scale, d.precision))
        case d: DecimalType if d.precision <= 18 =>
          Types.primitive(INT64, rep).as(decimalType(d.scale, d.precision))
        case d: DecimalType =>
          Types.primitive(FIXED_LEN_BYTE_ARRAY, rep)
            .length(minBytesForPrecision(d.precision))
            .as(decimalType(d.scale, d.precision))
        case other => throw new UnsupportedOperationException(
          s"graft DSv2 writer supports flat primitive schemas; column " +
            s"${f.name} is ${other.simpleString}. Write nested tables " +
            "through CowTable.")
      }
      b.addField(t.named(f.name))
    }
    b.named("graft_write")
  }

  /** Per-column (group, row, ordinal) appender, resolved once per writer. */
  def setters(schema: StructType): Array[(Group, InternalRow, Int) => Unit] =
    schema.fields.map { f =>
      f.dataType match {
        case BooleanType => (g, r, i) => g.add(i, r.getBoolean(i))
        case ByteType => (g, r, i) => g.add(i, r.getByte(i).toInt)
        case ShortType => (g, r, i) => g.add(i, r.getShort(i).toInt)
        case IntegerType | DateType => (g, r, i) => g.add(i, r.getInt(i))
        case LongType | TimestampType | TimestampNTZType =>
          (g, r, i) => g.add(i, r.getLong(i))
        case FloatType => (g, r, i) => g.add(i, r.getFloat(i))
        case DoubleType => (g, r, i) => g.add(i, r.getDouble(i))
        case StringType =>
          // fromReusedByteArray: UnsafeRow-backed strings hand out buffers
          // parquet must copy before the row is recycled (dictionary pages
          // hold Binary refs; "reused" marks them copy-on-retain)
          (g, r, i) =>
            g.add(i, Binary.fromReusedByteArray(r.getUTF8String(i).getBytes))
        case BinaryType =>
          (g, r, i) => g.add(i, Binary.fromReusedByteArray(r.getBinary(i)))
        case d: DecimalType if d.precision <= 9 =>
          (g, r, i) =>
            g.add(i, r.getDecimal(i, d.precision, d.scale).toUnscaledLong.toInt)
        case d: DecimalType if d.precision <= 18 =>
          (g, r, i) =>
            g.add(i, r.getDecimal(i, d.precision, d.scale).toUnscaledLong)
        case d: DecimalType =>
          val n = minBytesForPrecision(d.precision)
          (g, r, i) => {
            val unscaled = r.getDecimal(i, d.precision, d.scale)
              .toJavaBigDecimal.unscaledValue().toByteArray
            // sign-extend to the fixed width (big-endian two's complement)
            val fixed = new Array[Byte](n)
            if (unscaled.head < 0) java.util.Arrays.fill(fixed, -1: Byte)
            System.arraycopy(unscaled, 0, fixed, n - unscaled.length,
              unscaled.length)
            g.add(i, Binary.fromConstantByteArray(fixed))
          }
        case other => throw new UnsupportedOperationException(
          s"graft DSv2 writer: unsupported column type ${other.simpleString}")
      }
    }
}

/** Builder: plain append by default; `truncate()` (INSERT OVERWRITE /
  * mode("overwrite")) drops the carry-over so the commit replaces the whole
  * snapshot — same semantics as [[CowTable.overwrite]]. */
final class GraftWriteBuilder(
    root: Path, parent: Int, tableSchema: StructType,
    primaryKey: Seq[String], partitionKey: Option[String],
    info: LogicalWriteInfo)
  extends WriteBuilder with SupportsTruncate {

  private var overwrite = false

  override def truncate(): WriteBuilder = { overwrite = true; this }

  override def build(): Write = {
    GraftParquetIO.messageType(info.schema()) // fail fast: flat schemas only
    new Write {
    override def description(): String =
      s"graft $root ${if (overwrite) "overwrite" else "append"}" +
        s" basedOn=v$parent"
      override def toBatch: BatchWrite = new GraftBatchWrite(
        root, parent, info.schema(), tableSchema, primaryKey, partitionKey,
        overwrite)
    }
  }
}

final case class GraftCommitMessage(path: String, rows: Long)
  extends WriterCommitMessage

/** Driver-side commit protocol: executors report (relative path, rows); the
  * commit stats exactly those files and CASes the manifest. An aborted job
  * deletes the reported files — unreported stragglers stay as unreferenced
  * garbage, the same inert state a crashed API writer leaves. */
final class GraftBatchWrite(
    root: Path, parent: Int, writeSchema: StructType,
    tableSchema: StructType, primaryKey: Seq[String],
    partitionKey: Option[String], overwrite: Boolean)
  extends BatchWrite {

  /** Writer-unique data dir (see [[CowTable.writeVersion]]). */
  private val verSeg = f"v${parent + 1}%05d-" +
    java.util.UUID.randomUUID.toString.replace("-", "").substring(0, 8)

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftWriterFactory(root.toString, verSeg, writeSchema.json)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.toSeq.collect {
      case GraftCommitMessage(p, n) if p != null => (p, n)
    }
    val spark = SparkSession.active
    val tbl = CowTable(spark, root.toString,
      TableConfig(root.getFileName.toString, primaryKey, partitionKey))
    val fresh = tbl.statListedFiles(files,
      if (parent > 0) tableSchema else writeSchema)
    val carry =
      if (overwrite || parent == 0) Nil
      else CowTable.manifestAt(root, parent).files
    // commit schema: the existing table's schema for appends/overwrites of a
    // live table (Spark already aligned the query output to it); the query
    // schema when this write CREATES the table (CTAS / first write)
    tbl.commitAt(parent, fresh,
      carry, if (parent > 0) tableSchema else writeSchema)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case GraftCommitMessage(p, _) if p != null =>
        Files.deleteIfExists(root.resolve(p))
      case _ => ()
    }
    Try(Files.deleteIfExists(root.resolve(verSeg)))
  }
}

/** Serializable executor-side factory (schema ships as JSON). */
final class GraftWriterFactory(
    rootStr: String, verSeg: String, schemaJson: String)
  extends DataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(rootStr, verSeg,
      DataType.fromJson(schemaJson).asInstanceOf[StructType],
      partitionId, taskId)
}

/** One task's writer: lazily opens `<verSeg>/part-<partition>-<task>.parquet`
  * on the first row (empty partitions produce NO file, not an empty one),
  * counts rows, deletes its file on abort. */
final class GraftDataWriter(
    rootStr: String, verSeg: String, schema: StructType,
    partitionId: Int, taskId: Long)
  extends DataWriter[InternalRow] {

  private val relPath = f"$verSeg/part-$partitionId%05d-$taskId.parquet"
  private val absPath = Paths.get(rootStr).resolve(relPath)
  private val messageType = GraftParquetIO.messageType(schema)
  private val setters = GraftParquetIO.setters(schema)
  private var writer: ParquetWriter[Group] = _
  private var factory: SimpleGroupFactory = _
  private var rows = 0L

  /** Row-level writes deliver (metadataRow, dataRow); the data row is
    * already projected to the write schema — metadata is not persisted. */
  override def write(meta: InternalRow, data: InternalRow): Unit = write(data)

  override def write(r: InternalRow): Unit = {
    if (writer == null) {
      Files.createDirectories(absPath.getParent)
      writer = ExampleParquetWriter
        .builder(new org.apache.hadoop.fs.Path(absPath.toString))
        .withType(messageType)
        .withConf(new Configuration())
        .withCompressionCodec(CompressionCodecName.SNAPPY)
        .build()
      factory = new SimpleGroupFactory(messageType)
    }
    val g = factory.newGroup()
    var i = 0
    while (i < setters.length) {
      if (!r.isNullAt(i)) setters(i)(g, r, i)
      i += 1
    }
    writer.write(g)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    close()
    GraftCommitMessage(if (rows == 0) null else relPath, rows)
  }

  override def abort(): Unit = {
    close()
    Files.deleteIfExists(absPath)
  }

  override def close(): Unit =
    if (writer != null) { writer.close(); writer = null }
}
