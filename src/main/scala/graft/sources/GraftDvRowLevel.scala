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

/** DELTA-BASED row-level operations (SQL `DELETE` / `UPDATE` / `MERGE`) for
  * deletion-vector tables — Spark's `SupportsDelta` contract instead of the
  * group-based ReplaceData rewrite of [[GraftRowLevelOperation]]:
  *
  *   - The scan is the ORDINARY [[GraftScanBuilder]] (static key-range /
  *     partition file pruning via the pushed WHERE clause, existing
  *     deletion vectors subtracted, row-mode readers) plus the two
  *     metadata columns Spark resolves as the ROW ID: `_file` (which data
  *     file) and `_pos` (row position within it) — a (file, pos) pair IS a
  *     deletion-vector entry.
  *   - Spark feeds the writer only the AFFECTED rows: `delete(meta, id)` /
  *     `update(meta, id, row)` / `insert(row)`. Tasks append marked
  *     positions to transport parquet files (update- and delete-marks
  *     SEPARATELY, so mixed-clause MERGEs type their change-feed rows
  *     exactly) and write updated/inserted rows as fresh data files —
  *     commit cost O(affected rows), never O(touched file bytes). The
  *     commit folds positions into a sidecar and publishes via the usual
  *     manifest CAS ([[CowTable.commitDeltaDv]]).
  *
  * This is the reference's own CDC apply statement
  * (reference: src/delta/delta-cdc-load.py:138-141, a SQL MERGE/DELETE)
  * getting the merge-on-read write economics Delta deletion vectors give
  * it — without this, a DV-enabled table mutated through SQL silently pays
  * full copy-on-write costs. Since round 13, MERGE routes here too (the
  * delta writer's insert() covers NOT MATCHED rows; schema-evolution
  * merges re-resolve the table post-ALTER like every other path): a MERGE
  * on a DV table REWRITES NO DATA FILE — positions sidecar + fresh
  * update/insert files only.
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
  with org.apache.spark.sql.connector.write.SupportsDelta
  with SourceBoundedRowLevelOp {

  override def command(): Command = cmd

  private[sources] def manifest: CommitManifest = m

  private[sources] def tableRoot: Path = root

  override def description(): String =
    s"graft delta (deletion-vector) row-level $cmd on $root v$parent"

  /** (file, position) — exactly one deletion-vector entry per id. */
  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(GraftTable.FileColumnName),
    Expressions.column(GraftTable.PosColumnName))

  /** The ordinary table scan: pushed-filter file pruning + DV subtraction
    * come with it; row mode is forced because `_pos` is a running per-file
    * counter only the row reader maintains. A delta MERGE has no static
    * predicates and no runtime group filter, so the scan also honors the
    * [[MergeSourcePrune]] candidate set (dynamicKeep) — match discovery
    * reads O(candidate files), not the table. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(root, m, tableSchema, columnar = false,
      dynamicKeep = () => sourceKeyFiles)

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
      updPosFiles = msgs.flatMap(_.updPosFiles),
      delPosFiles = msgs.flatMap(_.delPosFiles))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case GraftDvDeltaCommitMessage(ins, upd, updPos, delPos) =>
        (ins ++ upd).foreach { case (p, _) =>
          Files.deleteIfExists(root.resolve(p))
        }
        (updPos ++ delPos).foreach(p =>
          Files.deleteIfExists(root.resolve(p)))
      case _ => ()
    }
    Try(Files.deleteIfExists(root.resolve(verSeg)))
  }
}

/** (relative path, rows) of inserted and updated data files, plus the
  * task's transport parquets of marked (path, pos) rows — update-marks and
  * delete-marks apart (change-feed preimage typing). */
final case class GraftDvDeltaCommitMessage(
    inserts: Seq[(String, Long)], updates: Seq[(String, Long)],
    updPosFiles: Seq[String], delPosFiles: Seq[String])
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

  /** One mark stream (update- or delete-marks): lazily opened transport
    * parquet of root-relative (path, pos) rows. */
  private final class MarkStream(tag: String) {
    private var writer: ParquetWriter[Group] = _
    var path: String = _
    def mark(id: InternalRow): Unit = {
      if (writer == null) {
        path = f"$verSeg/dvpending/$tag%s-$partitionId%05d-$taskId.parquet"
        val abs = Paths.get(rootStr).resolve(path)
        Files.createDirectories(abs.getParent)
        writer = ExampleParquetWriter
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
      writer.write(g)
    }
    def finish(): Seq[String] =
      if (writer == null) Nil
      else { writer.close(); writer = null; Seq(path) }
    def abort(): Unit = {
      if (writer != null) { writer.close(); writer = null }
      if (path != null)
        Files.deleteIfExists(Paths.get(rootStr).resolve(path))
    }
    def close(): Unit =
      if (writer != null) { writer.close(); writer = null }
  }

  private val updMarks = new MarkStream("updmark")
  private val delMarks = new MarkStream("delmark")

  override def delete(meta: InternalRow, id: InternalRow): Unit =
    delMarks.mark(id)

  override def update(
      meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    updMarks.mark(id)
    upd.write(row)
  }

  override def insert(row: InternalRow): Unit = ins.write(row)

  override def write(row: InternalRow): Unit = insert(row)

  override def commit(): WriterCommitMessage = {
    val i = ins.commit() match { case GraftCommitMessage(fs) => fs }
    val u = upd.commit() match { case GraftCommitMessage(fs) => fs }
    GraftDvDeltaCommitMessage(i, u, updMarks.finish(), delMarks.finish())
  }

  override def abort(): Unit = {
    ins.abort()
    upd.abort()
    updMarks.abort()
    delMarks.abort()
  }

  override def close(): Unit = {
    ins.close()
    upd.close()
    updMarks.close()
    delMarks.close()
  }
}
