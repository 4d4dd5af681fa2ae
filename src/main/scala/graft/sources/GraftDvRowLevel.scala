package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.util.Try

import graft.storage.{CommitManifest, CowTable}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DELTA-BASED row-level operations (SQL `DELETE` / `UPDATE`) for
  * deletion-vector tables — Spark's `SupportsDelta` contract instead of the
  * group-based ReplaceData rewrite of [[GraftRowLevelOperation]]:
  *
  *   - The scan is the ORDINARY [[GraftScanBuilder]] (static key-range /
  *     partition file pruning via the pushed WHERE clause, existing
  *     deletion vectors subtracted, row-mode readers) plus the two
  *     metadata columns Spark resolves as the ROW ID: `_file` (which data
  *     file) and `_pos` (row position within it) — a (file, pos) pair IS a
  *     deletion-vector entry.
  *   - Spark feeds the writer only the MATCHED rows: `delete(meta, id)` /
  *     `update(meta, id, row)`. Tasks append marked positions to transport
  *     parquet files and write updated rows as fresh data files — commit
  *     cost O(matched rows), never O(touched file bytes). The commit folds
  *     positions into a sidecar and publishes via the usual manifest CAS
  *     ([[CowTable.commitDeltaDv]]).
  *
  * This is the reference's own CDC apply statement
  * (reference: src/delta/delta-cdc-load.py:138-141, a SQL MERGE/DELETE)
  * getting the merge-on-read write economics Delta deletion vectors give
  * it — without this, a DV-enabled table mutated through SQL silently pays
  * full copy-on-write costs. MERGE keeps the group-based path (it owns
  * schema evolution and arbitrary action shapes).
  */
final class GraftDvRowLevelOperationBuilder(
    root: Path, version: Int, m: CommitManifest, tableSchema: StructType,
    info: RowLevelOperationInfo)
  extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new GraftDvRowLevelOperation(root, version, m, tableSchema,
      info.command())
}

final class GraftDvRowLevelOperation(
    root: Path, parent: Int, m: CommitManifest, tableSchema: StructType,
    cmd: Command)
  extends RowLevelOperation
  with org.apache.spark.sql.connector.write.SupportsDelta {

  override def command(): Command = cmd

  override def description(): String =
    s"graft delta (deletion-vector) row-level $cmd on $root v$parent"

  /** (file, position) — exactly one deletion-vector entry per id. */
  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(GraftTable.FileColumnName),
    Expressions.column(GraftTable.PosColumnName))

  /** The ordinary table scan: pushed-filter file pruning + DV subtraction
    * come with it; row mode is forced because `_pos` is a running per-file
    * counter only the row reader maintains. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(root, m, tableSchema, columnar = false)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new GraftDvDeltaWriteBuilder(root, parent, m, tableSchema, cmd, info)
}

final class GraftDvDeltaWriteBuilder(
    root: Path, parent: Int, m: CommitManifest, tableSchema: StructType,
    cmd: Command, info: LogicalWriteInfo)
  extends DeltaWriteBuilder {

  override def build(): DeltaWrite = {
    GraftParquetIO.messageType(info.schema()) // flat schemas only, fail fast
    // field order of the id row, from Spark's own row-id schema — never
    // assumed (a projection reorder would silently swap file and position)
    val idSchema = info.rowIdSchema().orElseThrow(() =>
      new IllegalStateException(
        "graft delta write: Spark supplied no row-id schema"))
    val fileIdx = idSchema.fieldIndex(GraftTable.FileColumnName)
    val posIdx = idSchema.fieldIndex(GraftTable.PosColumnName)
    new DeltaWrite {
      override def description(): String =
        s"graft delta (deletion-vector) $cmd $root basedOn=v$parent"
      override def toBatch: DeltaBatchWrite = new GraftDvDeltaBatchWrite(
        root, parent, m, tableSchema, cmd, info.schema(), fileIdx, posIdx)
    }
  }
}

final class GraftDvDeltaBatchWrite(
    root: Path, parent: Int, m: CommitManifest, tableSchema: StructType,
    cmd: Command, writeSchema: StructType, fileIdx: Int, posIdx: Int)
  extends DeltaBatchWrite {

  private val verSeg = f"v${parent + 1}%05d-" +
    java.util.UUID.randomUUID.toString.replace("-", "").substring(0, 8)

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory =
    new GraftDvDeltaWriterFactory(root.toString, verSeg,
      GraftParquetIO.physicalSchema(writeSchema, m.columnMapping).json,
      m.partitionKey, fileIdx, posIdx)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.toSeq.collect { case g: GraftDvDeltaCommitMessage => g }
    val tbl = CowTable(SparkSession.active, root.toString,
      m.tableConfig(root.getFileName.toString))
    tbl.commitDeltaDv(parent,
      insertFiles = msgs.flatMap(_.inserts),
      updateFiles = msgs.flatMap(_.updates),
      posFiles = msgs.flatMap(_.posFiles),
      isUpdate = cmd == Command.UPDATE)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case GraftDvDeltaCommitMessage(ins, upd, pos) =>
        (ins ++ upd).foreach { case (p, _) =>
          Files.deleteIfExists(root.resolve(p))
        }
        pos.foreach(p => Files.deleteIfExists(root.resolve(p)))
      case _ => ()
    }
    Try(Files.deleteIfExists(root.resolve(verSeg)))
  }
}

/** (relative path, rows) of inserted and updated data files, plus the
  * task's transport parquet of marked (path, pos) rows. */
final case class GraftDvDeltaCommitMessage(
    inserts: Seq[(String, Long)], updates: Seq[(String, Long)],
    posFiles: Seq[String])
  extends WriterCommitMessage

final class GraftDvDeltaWriterFactory(
    rootStr: String, verSeg: String, schemaJson: String,
    partitionKey: Option[String], fileIdx: Int, posIdx: Int)
  extends DeltaWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDvDeltaWriter(rootStr, verSeg,
      DataType.fromJson(schemaJson).asInstanceOf[StructType],
      partitionKey, partitionId, taskId, fileIdx, posIdx)
}

/** One task's delta writer: inserted rows land under `<verSeg>/i/`, updated
  * rows under `<verSeg>/u/` (separate dirs so the commit can type the CDF
  * rows exactly), marked positions stream into one transport parquet at
  * `<verSeg>/dvpending/` — nothing is buffered per row, a task deleting
  * millions of rows holds one open writer per output. */
final class GraftDvDeltaWriter(
    rootStr: String, verSeg: String, schema: StructType,
    partitionKey: Option[String], partitionId: Int, taskId: Long,
    fileIdx: Int, posIdx: Int)
  extends DeltaWriter[InternalRow] {

  private val ins = new GraftDataWriter(rootStr, verSeg + "/i", schema,
    partitionKey, partitionId, taskId)
  private val upd = new GraftDataWriter(rootStr, verSeg + "/u", schema,
    partitionKey, partitionId, taskId)

  private val posSchema = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("pos", LongType, nullable = false)))
  private val posType = GraftParquetIO.messageType(posSchema)
  private val posFactory = new SimpleGroupFactory(posType)
  private var posWriter: ParquetWriter[Group] = _
  private var posPath: String = _

  private def mark(id: InternalRow): Unit = {
    if (posWriter == null) {
      posPath = f"$verSeg/dvpending/mark-$partitionId%05d-$taskId.parquet"
      val abs = Paths.get(rootStr).resolve(posPath)
      Files.createDirectories(abs.getParent)
      posWriter = ExampleParquetWriter
        .builder(new org.apache.hadoop.fs.Path(abs.toString))
        .withType(posType)
        .withConf(new org.apache.hadoop.conf.Configuration())
        .withCompressionCodec(CompressionCodecName.SNAPPY)
        .build()
    }
    // `_file` rides as the ABSOLUTE path ([[GraftPartitionReader]]); the
    // sidecar convention is root-relative
    val absFile = id.getUTF8String(fileIdx).toString
    val g = posFactory.newGroup()
    g.add(0, Binary.fromString(absFile.substring(rootStr.length + 1)))
    g.add(1, id.getLong(posIdx))
    posWriter.write(g)
  }

  override def delete(meta: InternalRow, id: InternalRow): Unit = mark(id)

  override def update(
      meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    mark(id)
    upd.write(row)
  }

  override def insert(row: InternalRow): Unit = ins.write(row)

  override def write(row: InternalRow): Unit = insert(row)

  override def commit(): WriterCommitMessage = {
    val i = ins.commit() match { case GraftCommitMessage(fs) => fs }
    val u = upd.commit() match { case GraftCommitMessage(fs) => fs }
    val p = if (posWriter != null) {
      posWriter.close(); posWriter = null
      Seq(posPath)
    } else Nil
    GraftDvDeltaCommitMessage(i, u, p)
  }

  override def abort(): Unit = {
    ins.abort()
    upd.abort()
    if (posWriter != null) { posWriter.close(); posWriter = null }
    if (posPath != null)
      Files.deleteIfExists(Paths.get(rootStr).resolve(posPath))
  }

  override def close(): Unit = {
    ins.close()
    upd.close()
    if (posWriter != null) { posWriter.close(); posWriter = null }
  }
}
