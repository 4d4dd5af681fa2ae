package graft.sources

import graft.storage.{CommitManifest, FileEntry}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.types._

/** PARTIAL aggregate pushdown (`supportCompletePushDown = false`): the
  * per-file refinement of the manifest aggregate path. The complete path
  * rejects the whole pushdown the moment ANY file carries a deletion
  * vector, lacks usable stats, or has a sign-ambiguous ±0.0 extremum —
  * at 100 TB that means one small MOR delete re-scans the entire table
  * for a `SELECT min(k), max(k), count(*)`. Here the rejection becomes
  * per-file: every file whose manifest evidence answers EVERY aggregate
  * folds driver-side into one pre-aggregated row (zero IO), and only the
  * undecidable files — DV'd, stat-less, all-null-key, ±0.0-extremum —
  * are read, each emitting one pre-aggregated row computed over its live
  * rows. Spark's final merge (min of mins, max of maxes, sum of counts)
  * stitches the two exactly; the global aggregate always sees ≥ 1 input
  * row because the manifest row is emitted even when it folded nothing.
  *
  * Scope: global (no GROUP BY) MIN/MAX of the leading key or a declared
  * stats column (numeric/temporal stat space), COUNT(*), COUNT(col) of a
  * non-partition column. Anything else declines — Spark then runs the
  * normal plan, which is never wrong, only slower.
  */
private[sources] object PartialAgg {

  /** One pushed aggregate column. `srcIdx` is the column's ordinal in the
    * per-file read schema (−1 for COUNT(*), which reads no column). */
  sealed trait Spec extends Serializable { def srcIdx: Int }
  final case class CountStarSpec() extends Spec { val srcIdx: Int = -1 }
  final case class CountColSpec(srcIdx: Int) extends Spec
  final case class MinSpec(srcIdx: Int, dt: DataType) extends Spec
  final case class MaxSpec(srcIdx: Int, dt: DataType) extends Spec

  /** The planned split: output schema (group column first when grouped),
    * the folded manifest rows (one per group; exactly one when global),
    * the files that must be read with their group-value prefixes, and the
    * (logical) per-file read schema. */
  final case class Plan(
      schema: StructType, manifestRows: Seq[Array[Any]],
      readFiles: Seq[FileEntry], readSchema: StructType, specs: Seq[Spec],
      readPrefixes: Map[String, Array[Any]] = Map.empty)

  /** Spark's NaN-greatest numeric ordering over internal values of the
    * decodable stat types (the only types specs admit). */
  private[sources] def cmp(dt: DataType): (Any, Any) => Int = dt match {
    case LongType | TimestampType | TimestampNTZType =>
      (a, b) => java.lang.Long.compare(
        a.asInstanceOf[Long], b.asInstanceOf[Long])
    case IntegerType | DateType =>
      (a, b) => java.lang.Integer.compare(
        a.asInstanceOf[Int], b.asInstanceOf[Int])
    case ShortType => (a, b) => java.lang.Short.compare(
      a.asInstanceOf[Short], b.asInstanceOf[Short])
    case ByteType => (a, b) => java.lang.Byte.compare(
      a.asInstanceOf[Byte], b.asInstanceOf[Byte])
    case DoubleType => (a, b) => java.lang.Double.compare(
      a.asInstanceOf[Double], b.asInstanceOf[Double])
    case FloatType => (a, b) => java.lang.Float.compare(
      a.asInstanceOf[Float], b.asInstanceOf[Float])
    case other => throw new IllegalStateException(
      s"partial agg over non-decodable type $other") // unreachable by spec
  }
}

/** The partial-agg batch: one synthetic partition carrying the folded
  * manifest row plus one partition per file that must actually be read. */
final class GraftPartialAggScan(
    root: java.nio.file.Path, m: CommitManifest, plan: PartialAgg.Plan)
  extends Scan with Batch {

  override def readSchema(): StructType = plan.schema
  override def toBatch: Batch = this

  override def description(): String =
    s"graft partial_agg_pushdown v${m.version} " +
      s"(${plan.manifestRows.size} manifest row(s) + " +
      s"${plan.readFiles.size}/${m.files.size} files read)"

  override def planInputPartitions(): Array[InputPartition] = {
    val manifest: InputPartition =
      ManifestAggPartition(plan.manifestRows.toArray)
    val reads: Seq[InputPartition] = plan.readFiles.map { e =>
      AggFilePartition(
        root.resolve(e.path).toString,
        GraftScan.hivePathValues(e.path),
        e.dvPath.map(p => (root.resolve(p).toString, e.path)),
        plan.readPrefixes.getOrElse(e.path, Array.empty[Any]))
    }
    (manifest +: reads).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftPartialAggReaderFactory(
      GraftParquetIO.physicalSchema(plan.readSchema, m.columnMapping),
      plan.specs)
}

final case class ManifestAggPartition(rows: Array[Array[Any]])
  extends InputPartition

final case class AggFilePartition(
    filePath: String, partitionValues: Map[String, String],
    dv: Option[(String, String)],
    /** Group-value prefix prepended to the emitted row (empty = global). */
    prefix: Array[Any]) extends InputPartition

final class GraftPartialAggReaderFactory(
    physReadSchema: StructType, specs: Seq[PartialAgg.Spec])
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = p match {
    case ManifestAggPartition(rows) => new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = new GenericInternalRow(rows(i))
      override def close(): Unit = ()
    }
    case AggFilePartition(path, pv, dv, prefix) =>
      new FileAggReader(
        new GraftPartitionReader(path, physReadSchema, pv, dv),
        physReadSchema, specs, prefix)
  }
}

/** Drains one file's LIVE rows (the underlying reader subtracts deletion
  * vectors) and emits a single pre-aggregated row: per-spec COUNT /
  * null-ignoring MIN/MAX over the file — O(file) once, O(columns needed)
  * wide. */
final class FileAggReader(
    under: PartitionReader[InternalRow], schema: StructType,
    specs: Seq[PartialAgg.Spec], prefix: Array[Any] = Array.empty)
  extends PartitionReader[InternalRow] {

  private var emitted = false
  private lazy val result: InternalRow = {
    val counts = Array.fill(specs.size)(0L)
    val best = Array.fill[Any](specs.size)(null)
    val cmps = specs.map {
      case PartialAgg.MinSpec(_, dt) => PartialAgg.cmp(dt)
      case PartialAgg.MaxSpec(_, dt) => PartialAgg.cmp(dt)
      case _ => null
    }.toArray
    val dts = specs.map {
      case PartialAgg.MinSpec(_, dt) => dt
      case PartialAgg.MaxSpec(_, dt) => dt
      case _ => NullType
    }.toArray
    while (under.next()) {
      val row = under.get()
      var i = 0
      while (i < specs.size) {
        specs(i) match {
          case _: PartialAgg.CountStarSpec => counts(i) += 1L
          case PartialAgg.CountColSpec(s) =>
            if (!row.isNullAt(s)) counts(i) += 1L
          case PartialAgg.MinSpec(s, _) =>
            if (!row.isNullAt(s)) {
              val v = row.get(s, dts(i))
              if (best(i) == null || cmps(i)(v, best(i)) < 0) best(i) = v
            }
          case PartialAgg.MaxSpec(s, _) =>
            if (!row.isNullAt(s)) {
              val v = row.get(s, dts(i))
              if (best(i) == null || cmps(i)(v, best(i)) > 0) best(i) = v
            }
        }
        i += 1
      }
    }
    new GenericInternalRow(prefix ++ specs.zipWithIndex.map {
      case (_: PartialAgg.CountStarSpec, i) => counts(i): Any
      case (_: PartialAgg.CountColSpec, i) => counts(i): Any
      case (_, i) => best(i)
    })
  }

  override def next(): Boolean = {
    if (emitted) return false
    val _ = result // force the drain
    emitted = true
    true
  }
  override def get(): InternalRow = result
  override def close(): Unit = under.close()
}
