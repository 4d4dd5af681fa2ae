package graft.sources

import java.nio.file.Path

import graft.storage.{CommitManifest, CowTable, FileEntry, TableConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** GROUP-BASED row-level operations (SQL `MERGE INTO` / `UPDATE` / `DELETE`)
  * for graft tables — the last reference surface a SQL-only user could not
  * reach: the reference's CDC apply step IS a SQL MERGE
  * (reference: src/iceberg/iceberg-cdc-load.py:130-150,
  * src/delta/delta-cdc-load.py:121-141).
  *
  * How the copy-on-write contract maps onto Spark's framework:
  *   - Spark's RewriteMergeIntoTable plans a ReplaceData: it reads all rows
  *     of the AFFECTED GROUPS through [[GraftRowLevelScan]], applies the
  *     merge actions, and writes the groups' replacement rows through
  *     [[GraftRowLevelBatchWrite]].
  *   - "Group" here = data file. The scan records exactly which files it
  *     planned; the commit replaces those files (current manifest minus
  *     scanned, plus freshly written) via the same hard-link CAS every other
  *     write path uses — a concurrent commit loses loudly.
  *   - Affected-group discovery is RUNTIME pruning
  *     ([[SupportsRuntimeV2Filtering]] on the `_file` METADATA COLUMN, the
  *     group id itself): Spark joins the table with the source on the merge
  *     condition as a subquery and hands back IN(_file, <matched paths>) —
  *     EXACTLY the files holding matched rows, for any key arity (a
  *     composite-key MERGE prunes precisely, where per-column min/max could
  *     only approximate; same design as the reference formats' file-based
  *     group filtering). A 100-row CDC batch therefore rewrites a handful of
  *     files, not the table. Key-column IN predicates are still understood
  *     and prune via footer stats ([[CowTable.filesContainingAny]], both
  *     stat-tracked columns). If Spark skips the runtime filter entirely,
  *     every file is scanned and rewritten — degraded to a full COW rewrite,
  *     never wrong.
  *
  * Static merge-condition predicates are deliberately NOT pushed into file
  * skipping here: a group-based rewrite must emit every surviving row of a
  * scanned file, and only the runtime group filter is guaranteed by Spark's
  * planner to narrow groups rather than rows.
  */
final class GraftRowLevelOperationBuilder(
    root: Path, version: Int, m: CommitManifest, tableSchema: StructType,
    info: RowLevelOperationInfo)
  extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new GraftRowLevelOperation(root, version, m, tableSchema, info.command())
}

/** Side channel for [[MergeSourcePrune]], shared by the group-based and
  * delta-based (deletion-vector) row-level operations: the optimizer rule
  * computes the merge SOURCE's candidate file paths before execution; the
  * operation's scan(s) intersect with them at partition-planning time.
  * None ⇒ no prune (full behavior). */
private[sources] trait SourceBoundedRowLevelOp {
  /** Paths of files whose key stats can contain at least one merge-source
    * key. Files a source key cannot reach hold no matched rows, so
    * dropping them from match discovery is always sound. */
  @volatile private[sources] var sourceKeyFiles: Option[Set[String]] = None

  /** One-shot guard across optimizer fixed-point iterations (the bounds
    * job must run at most once per statement). */
  @volatile private[sources] var sourcePruneAttempted: Boolean = false

  private[sources] def manifest: CommitManifest

  private[sources] def tableRoot: Path
}

final class GraftRowLevelOperation(
    root: Path, parent: Int, m: CommitManifest, tableSchema: StructType,
    cmd: Command)
  extends RowLevelOperation with SourceBoundedRowLevelOp {

  /** Files the ReplaceData scan actually planned — the groups the commit
    * replaces. Written by [[GraftRowLevelScan.planInputPartitions]] (driver-
    * side, after runtime filtering); None until the scan plans (a write
    * committing without a planned scan replaces nothing). */
  @volatile private[sources] var scannedFiles: Option[Seq[FileEntry]] = None

  // sourceKeyFiles ([[SourceBoundedRowLevelOp]]): both scan instances (the
  // matching-rows subquery AND the ReplaceData scan) intersect with it, so
  // group discovery reads O(candidate files) instead of the whole
  // column-pruned table. Files a source key cannot reach hold no matched
  // rows, so dropping them from a group-based plan only moves them from
  // "scanned and rewritten unchanged" to "carried" — never wrong.

  private[sources] def manifest: CommitManifest = m

  private[sources] def tableRoot: Path = root

  override def command(): Command = cmd

  override def description(): String =
    s"graft row-level $cmd on $root v$parent"

  /** `_file` engages Spark's projecting write task (see
    * [[GraftTable.FileMetadataColumn]]); the write ignores the metadata row.
    */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(GraftTable.FileColumnName))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftRowLevelScanBuilder(this, root, m, tableSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftRowLevelWriteBuilder(this, root, parent, m, tableSchema, info)
}

final class GraftRowLevelScanBuilder(
    op: GraftRowLevelOperation, root: Path, m: CommitManifest,
    fullSchema: StructType)
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GraftRowLevelScan(op, root, m, required)
}

final class GraftRowLevelScan(
    op: GraftRowLevelOperation, root: Path, m: CommitManifest,
    required: StructType)
  extends Scan with Batch with SupportsRuntimeV2Filtering {

  @volatile private var kept: Seq[FileEntry] = m.files

  /** Runtime-filtered files ∩ source-bounded candidates (if the optimizer
    * computed them) — what this scan actually reads. */
  private def effectiveKept: Seq[FileEntry] = op.sourceKeyFiles match {
    case Some(allowed) => kept.filter(e => allowed(e.path))
    case None => kept
  }

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft row-level scan $root v${m.version} " +
      s"files=${effectiveKept.size}/${m.files.size}"

  override def toBatch: Batch = this

  /** Runtime group filtering on the `_file` metadata column — the group id
    * itself. Spark's matching-rows subquery yields the distinct `_file`
    * values of rows the operation touches; IN(_file, ...) then keeps EXACTLY
    * those files, independent of key arity or stat quality. (A single
    * multi-column key subquery does not survive V2 predicate translation, so
    * key-attribute filtering would silently degrade on composite keys;
    * `_file` is one attribute by construction. Same design as the reference
    * formats' copy-on-write scans.) */
  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(GraftTable.FileColumnName))

  override def filter(predicates: Array[Predicate]): Unit =
    predicates.foreach { p =>
      inValues(p).foreach { case (colIdx, vals) =>
        kept =
          if (colIdx < 0) { // _file: exact path-set membership
            val set = vals.map(String.valueOf(_)).toSet
            kept.filter(e => set(root.resolve(e.path).toString))
          } else CowTable.filesContainingAny(m.copy(files = kept), vals, colIdx)
      }
    }

  /** IN/= predicate on `_file` (→ colIdx -1) or a stat-tracked key column
    * (→ colIdx 0/1) → Some(colIdx → values); anything else → None (that
    * predicate is simply ignored — predicates are conjunctive, so each
    * understood one may prune files independently and an ignored one can
    * only keep extra files, never drop needed ones). A NULL value disables
    * pruning (file stats cannot locate nulls — same rule as merge pruning).
    */
  private def inValues(p: Predicate): Option[(Int, Seq[Any])] = {
    import org.apache.spark.sql.connector.expressions.{Literal => V2Literal}
    val vals = p.children().toSeq.collect {
      case l: V2Literal[_] => l.value()
    }
    val refs = p.children().toSeq.collect { case r: NamedReference => r }
    p.name() match {
      case "IN" | "=" if refs.size == 1 &&
        vals.size == p.children().length - 1 && !vals.contains(null) =>
        val ref = refs.head.fieldNames().toSeq
        if (ref == Seq(GraftTable.FileColumnName)) Some((-1, vals))
        else m.primaryKey.take(2).indexWhere(k => ref == Seq(k)) match {
          case -1 => None
          case i => Some((i, vals))
        }
      case _ => None
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val planned = effectiveKept
    op.scannedFiles = Some(planned)
    planned.map { e =>
      // existing deletion vectors MUST ride along: a group rewrite re-emits
      // every surviving row of a scanned file — reading marked rows back
      // would resurrect previously DV-deleted rows in the rewritten file
      GraftInputPartition(root.resolve(e.path).toString,
        GraftScan.hivePathValues(e.path),
        e.dvPath.map(p => (root.resolve(p).toString, e.path)))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // GENERATED-column backfill (partition-spec evolution): a row-level
    // scan of pre-evolution files must read the DERIVED value — a MERGE
    // condition on the generated column would otherwise see nulls (the
    // written value self-heals via TransformRecompute either way)
    val genFill: Option[GenFill] = GenFill.forScan(m, required, effectiveKept)
    // position-skipping and a requested `_pos` both need the row reader
    // (same degrades as GraftScan — the columnar path would silently
    // null-fill `_pos` as an absent file column)
    new GraftReaderFactory(required,
      columnar = effectiveKept.forall(_.dvPath.isEmpty) &&
        !required.fieldNames.contains(GraftTable.PosColumnName) &&
        genFill.isEmpty,
      mapping = m.columnMapping, genFill = genFill)
  }
}

final class GraftRowLevelWriteBuilder(
    op: GraftRowLevelOperation, root: Path, parent: Int, m: CommitManifest,
    tableSchema: StructType, info: LogicalWriteInfo)
  extends WriteBuilder {

  override def build(): Write = {
    GraftParquetIO.messageType(info.schema()) // flat schemas only, fail fast
    val partCol = m.partitionKey.filter(info.schema().fieldNames.contains)
    new Write
      with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
      import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
      import org.apache.spark.sql.connector.expressions.{Expressions, SortOrder}
      override def description(): String =
        s"graft row-level replace-data $root basedOn=v$parent"
      /** Replacement files of a partitioned table keep the hive layout, so
        * cluster by partition value; sort by the leading key column so the
        * rewritten files carry tight [minKey, maxKey] stats. */
      override def requiredDistribution(): Distribution = partCol match {
        case Some(k) => Distributions.clustered(Array(Expressions.identity(k)))
        case None => Distributions.unspecified()
      }
      override def requiredOrdering(): Array[SortOrder] = {
        val cols = (partCol.toSeq ++
          m.primaryKey.headOption.filter(info.schema().fieldNames.contains))
          .distinct
        cols.map(c => Expressions.sort(Expressions.column(c),
          org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
          .toArray
      }
      override def toBatch: BatchWrite = new GraftRowLevelBatchWrite(
        op, root, parent, m, tableSchema, info.schema())
    }
  }
}

/** Commit = replace the scanned groups: (current files − scanned) ∪ fresh,
  * published through [[CowTable.commitAt]]'s CAS. */
final class GraftRowLevelBatchWrite(
    op: GraftRowLevelOperation, root: Path, parent: Int, m: CommitManifest,
    tableSchema: StructType, writeSchema: StructType)
  extends BatchWrite {

  private val verSeg = f"v${parent + 1}%05d-" +
    java.util.UUID.randomUUID.toString.replace("-", "").substring(0, 8)

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftWriterFactory(root.toString, verSeg,
      GraftParquetIO.physicalSchema(writeSchema, m.columnMapping).json,
      m.partitionKey)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.toSeq.collect {
      case GraftCommitMessage(fs) => fs
    }.flatten
    val spark = SparkSession.active
    val tbl = CowTable(spark, root.toString,
      m.tableConfig(root.getFileName.toString))
    val fresh = tbl.statListedFiles(files, tableSchema, m.columnMapping)
    // CHECK constraints bind SQL MERGE/UPDATE too: validate the rewritten
    // files (modified rows + their carried file-mates) before the commit —
    // a violating SET clause throws with the files still unreferenced
    tbl.enforceConstraintsOnFiles(fresh, tableSchema, "row-level write",
      m.columnMapping)
    val scannedPaths = op.scannedFiles.getOrElse(Nil).map(_.path).toSet
    val carry = m.files.filterNot(f => scannedPaths(f.path))
    // changeDataFeed contract: a group-replace must RECORD its exact
    // changes (the replaced files' live rows diffed against their
    // replacements) — without this, the commit is a rewrite the file-
    // partition feed planner can only reject
    val cdc = tbl.replaceCdc(m, op.scannedFiles.getOrElse(Nil), fresh,
      tableSchema)
    op.scannedFiles match {
      // Snapshot-isolation rebase on CAS loss (same contract as CowTable
      // upsert/delete): winners that provably touched a disjoint key range
      // are carried forward; anything unprovable fails loud. The op's key
      // footprint = stat ranges of what it scanned + what it wrote.
      case Some(scanned) =>
        tbl.commitRowLevelRebased(parent, fresh, carry, tableSchema,
          scannedPaths, scanned ++ fresh, cdcDir = cdc)
      // no planned scan ⇒ no provable read set ⇒ keep plain fail-fast CAS
      case None => tbl.commitAt(parent, fresh, carry, tableSchema,
        cdcDir = cdc)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case GraftCommitMessage(fs) => fs.foreach { case (p, _) =>
        java.nio.file.Files.deleteIfExists(root.resolve(p))
      }
      case _ => ()
    }
    scala.util.Try(java.nio.file.Files.deleteIfExists(root.resolve(verSeg)))
  }
}
