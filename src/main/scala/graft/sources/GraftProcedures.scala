package graft.sources

import graft.storage.{CowTable, LakeRegistry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{
  BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** SQL `CALL` PROCEDURES for table maintenance — the Iceberg
  * `CALL catalog.system.rewrite_data_files(...)` surface the reference's
  * operators run for housekeeping, bound to graft's native operations:
  *
  * {{{
  *   CALL lake.compact('users')                -- fold small files
  *   CALL lake.optimize('users')               -- z-order by the key cols
  *   CALL lake.optimize('users', 'a,b')        -- z-order by given cols
  *   CALL lake.vacuum('users', 2)              -- expire unreferenced files
  *   CALL lake.rollback('users', 3)            -- restore version 3
  * }}}
  *
  * Each returns a one-row result (the new version / deleted-file count) as
  * a driver-local scan. Maintenance stays a catalog concern: the SQL user
  * never needs the Scala API to keep a 100 TB table healthy.
  */
object GraftProcedures {

  val All: Seq[String] =
    Seq("compact", "optimize", "vacuum", "rollback", "clone", "diff",
      "evolve_partition", "create_matview", "refresh_matview",
      "purge_vectors", "tag", "drop_tag", "generate_manifest",
      "create_release", "drop_release", "list_releases",
      "create_branch", "drop_branch", "fast_forward", "list_branches",
      "vacuum_age", "create_view", "drop_view", "list_views", "validate",
      "compute_stats")

  def load(warehouse: String, name: String): Option[UnboundProcedure] = {
    def open(tbl: String): CowTable =
      LakeRegistry.open(SparkSession.active, warehouse, tbl)
    name.toLowerCase match {
      case "compact" => Some(proc("compact",
        Seq(in("table", StringType),
          in("small_bytes", LongType, Some((32L << 20).toString)),
          in("target_partitions", IntegerType, Some("1")),
          in("partition_value", StringType, Some("''"))),
        resultSchema = versionResult) { args =>
        val scope = Option(args.getUTF8String(3))
          .map(_.toString).filter(_.nonEmpty)
        val v = open(str(args, 0))
          .compact(smallBytes = args.getLong(1),
            targetPartitions = args.getInt(2), partitionValue = scope)
        Array[Any](v)
      })
      // `full` (default false) forces a whole re-cluster; the default is
      // INCREMENTAL — files already z-ordered under the same signature
      // carry over untouched, so a nightly `CALL lake.optimize(t)` on a
      // growing table costs O(files added since last run), not O(table)
      case "optimize" => Some(proc("optimize",
        Seq(in("table", StringType),
          in("cluster_by", StringType, Some("''")),
          in("partition_value", StringType, Some("''")),
          in("full", BooleanType, Some("false"))),
        resultSchema = versionResult) { args =>
        val t = open(str(args, 0))
        val cols = str(args, 1).split(",").map(_.trim).filter(_.nonEmpty)
        val scope = Option(args.getUTF8String(2))
          .map(_.toString).filter(_.nonEmpty)
        val full = !args.isNullAt(3) && args.getBoolean(3)
        val v =
          if (cols.isEmpty) t.optimize(partitionValue = scope, full = full)
          else t.optimize(cols.toSeq, partitionValue = scope, full = full)
        Array[Any](v)
      })
      // CALL lake.purge_vectors('t'): rewrite deletion-vectored files
      // without their deleted rows (bin-packed like compact) and clear
      // the sidecars — the SQL handle for retiring the DV read-side tax
      case "purge_vectors" => Some(proc("purge_vectors",
        Seq(in("table", StringType),
          in("target_partitions", IntegerType, Some("1"))),
        resultSchema = versionResult) { args =>
        Array[Any](open(str(args, 0))
          .purgeDeletionVectors(args.getInt(1)))
      })
      // CALL lake.compute_stats('t'): backfill per-file NDV sketches on an
      // existing table (one column-pruned pass over just the lacking
      // files, metadata-only commit) and durably flip ndvSketch so future
      // writes maintain them — adopt CBO-grade distinctCount on a 100 TB
      // table without rewriting a byte.
      case "compute_stats" => Some(proc("compute_stats",
        Seq(in("table", StringType)),
        resultSchema = versionResult) { args =>
        val name = str(args, 0)
        val e = LakeRegistry.entries(warehouse)
          .find(_.table_name == name).getOrElse(
            throw new IllegalArgumentException(
              s"graft: no table $name in $warehouse"))
        val root = LakeRegistry.resolveRoot(warehouse, e)
        val cfg = graft.storage.CowTable
          .configAt(java.nio.file.Paths.get(root), e.config)
          .copy(ndvSketch = true)
        val t = CowTable(SparkSession.active, root, cfg)
        val v = t.computeNdvSketches()
        LakeRegistry.register(warehouse, cfg, e.root)
        Array[Any](v)
      })
      case "vacuum" => Some(proc("vacuum",
        Seq(in("table", StringType),
          in("retain_last", IntegerType, Some("2"))),
        resultSchema = StructType(Seq(
          StructField("deleted_files", IntegerType, nullable = false)))) {
        args =>
          Array[Any](open(str(args, 0)).vacuum(args.getInt(1)).size)
      })
      // CALL lake.vacuum_age('t', 86400000): age-based retention — every
      // version current within the window survives (Delta RETAIN-hours
      // shape; tag pins still hold through the delegated vacuum)
      case "vacuum_age" => Some(proc("vacuum_age",
        Seq(in("table", StringType), in("retain_ms", LongType)),
        resultSchema = StructType(Seq(
          StructField("deleted_files", IntegerType, nullable = false)))) {
        args =>
          Array[Any](open(str(args, 0)).vacuumOlderThan(args.getLong(1)).size)
      })
      // CALL lake.create_view('v', 'SELECT ...'): PERSISTED view — the
      // definition is validated by ANALYZING it in the calling session
      // (parse errors, missing tables, and self-reference all fail here,
      // loudly, before anything lands), then written atomically. SELECT
      // resolution of lake views is installed by graft.GraftExtensions
      // (vanilla Spark 4.1 routes neither CREATE VIEW DDL nor reads to a
      // DSv2 ViewCatalog — same approach as the public lake engines).
      case "create_view" => Some(proc("create_view",
        Seq(in("name", StringType), in("sql", StringType)),
        resultSchema = StructType(Seq(
          StructField("view", StringType, nullable = false)))) { args =>
        val name = str(args, 0)
        val sql = str(args, 1)
        require(!LakeRegistry.entries(warehouse)
          .exists(_.table_name == name),
          s"create_view: a TABLE named $name already exists in the lake")
        val s = SparkSession.active
        val schema = s.sql(sql).schema // analysis-validates the definition
        require(GraftViews.create(warehouse, name, GraftViews.ViewDef(
          sql, "", Seq("default"), schema.json,
          schema.fieldNames.toSeq, Nil, Nil, Map.empty)),
          s"create_view: view $name already exists — drop it first")
        Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(name))
      })
      case "drop_view" => Some(proc("drop_view",
        Seq(in("name", StringType)),
        resultSchema = StructType(Seq(
          StructField("dropped", BooleanType, nullable = false)))) { args =>
        Array[Any](GraftViews.delete(warehouse, str(args, 0)))
      })
      // CALL lake.validate('t'): integrity fsck — manifest vs filesystem
      // (files, DV sidecars, footer row counts) + key uniqueness; one row
      // per check, all ok ⇒ every pruning/merge shortcut is trustworthy
      case "validate" => Some(procRows("validate",
        Seq(in("table", StringType)),
        resultSchema = StructType(Seq(
          StructField("check", StringType, nullable = false),
          StructField("ok", BooleanType, nullable = false),
          StructField("detail", StringType, nullable = false)))) { args =>
        open(str(args, 0)).validate().collect().map(r => Array[Any](
          org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)),
          r.getBoolean(1),
          org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(2))
        )).toArray
      })
      // CALL lake.list_views(): one row per persisted view (name + sql)
      case "list_views" => Some(procRows("list_views", Seq(),
        resultSchema = StructType(Seq(
          StructField("view", StringType, nullable = false),
          StructField("sql", StringType, nullable = false)))) { _ =>
        GraftViews.list(warehouse).map { n =>
          Array[Any](
            org.apache.spark.unsafe.types.UTF8String.fromString(n),
            org.apache.spark.unsafe.types.UTF8String.fromString(
              GraftViews.read(warehouse, n).fold("")(_.sql)))
        }.toArray
      })
      // CALL lake.evolve_partition('t', 'region') / ('t') to un-partition:
      // partition-spec evolution as SQL (CowTable.alterPartitionKey —
      // metadata-only commit; old files keep their layout). The registry
      // entry is re-registered so future catalog opens see the new spec.
      case "evolve_partition" => Some(proc("evolve_partition",
        Seq(in("table", StringType),
          in("partition_by", StringType, Some("''"))),
        resultSchema = versionResult) { args =>
        val newKey = Option(args.getUTF8String(1))
          .map(_.toString).filter(_.nonEmpty)
        val src = open(str(args, 0))
        val evolved = src.alterPartitionKey(newKey)
        val entry = LakeRegistry.entries(warehouse)
          .find(_.table_name == str(args, 0)).get
        LakeRegistry.register(warehouse, evolved.config, entry.root)
        Array[Any](evolved.currentVersion)
      })
      // CALL lake.create_matview('daily', 'events', 'day', 'value'):
      // incrementally-maintained additive-aggregate view as a CATALOG
      // object — definition persisted at the view root, state queryable as
      // lake.default.<name>, kept current by CALL refresh_matview (signed
      // change-feed deltas; see graft.pipeline.MatView).
      // optional 5th arg: min/max columns (rescan-on-retract maintenance)
      case "create_matview" => Some(proc("create_matview",
        Seq(in("name", StringType), in("base_table", StringType),
          in("group_by", StringType), in("sum_columns", StringType),
          in("min_max_columns", StringType, Some("''"))),
        resultSchema = versionResult) { args =>
        def cols(i: Int): Seq[String] =
          Option(args.getUTF8String(i)).map(_.toString).getOrElse("")
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val mv = graft.pipeline.MatView.createInLake(
          SparkSession.active, warehouse, str(args, 0), str(args, 1),
          cols(2), cols(3), cols(4))
        Array[Any](mv.table.currentVersion)
      })
      case "refresh_matview" => Some(proc("refresh_matview",
        Seq(in("name", StringType)),
        resultSchema = StructType(Seq(
          StructField("versions_applied", IntegerType, nullable = false)))) {
        args =>
          Array[Any](graft.pipeline.MatView
            .openInLake(SparkSession.active, warehouse, str(args, 0))
            .refresh())
      })
      // CALL lake.tag('t', 'corpus-2024-08' [, version]): pin an IMMUTABLE
      // named ref (Iceberg tag) — release pinning; vacuum never expires a
      // tagged version, and `VERSION AS OF 'corpus-2024-08'` resolves it
      case "tag" => Some(proc("tag",
        Seq(in("table", StringType), in("name", StringType),
          in("version", IntegerType, Some("-1"))),
        resultSchema = versionResult) { args =>
        Array[Any](open(str(args, 0)).tag(str(args, 1), args.getInt(2)))
      })
      // CALL lake.generate_manifest('t'): Delta's GENERATE
      // symlink_format_manifest — external manifest-reading engines
      // (Spectrum/Presto/Athena) query the current snapshot without graft
      case "generate_manifest" => Some(proc("generate_manifest",
        Seq(in("table", StringType)),
        resultSchema = StructType(Seq(
          StructField("manifest_files", IntegerType, nullable = false)))) {
        args =>
          Array[Any](open(str(args, 0)).generateSymlinkManifest().size)
      })
      // CALL lake.create_release('corpus-v1', 'documents,embeddings'):
      // atomic multi-table publish — every named table's current version
      // pinned via tags, visible in one manifest link (storage/Release)
      case "create_release" => Some(proc("create_release",
        Seq(in("name", StringType), in("tables", StringType)),
        resultSchema = StructType(Seq(
          StructField("tables_pinned", IntegerType, nullable = false)))) {
        args =>
          val tables = str(args, 1).split(",").map(_.trim)
            .filter(_.nonEmpty).toSeq
          Array[Any](graft.storage.Release.create(SparkSession.active,
            warehouse, str(args, 0), tables).members.size)
      })
      // CALL lake.list_releases(): one row per (release, member table,
      // pinned version) — the release inventory, driver-local metadata
      case "list_releases" => Some(procRows("list_releases", Seq(),
        resultSchema = StructType(Seq(
          StructField("release", StringType, nullable = false),
          StructField("table", StringType, nullable = false),
          StructField("version", IntegerType, nullable = false)))) { _ =>
        graft.storage.Release.list(warehouse).flatMap { r =>
          graft.storage.Release.definition(warehouse, r).members.map(m =>
            Array[Any](
              org.apache.spark.unsafe.types.UTF8String.fromString(r),
              org.apache.spark.unsafe.types.UTF8String.fromString(m.table),
              m.version))
        }.toArray
      })
      case "drop_release" => Some(proc("drop_release",
        Seq(in("name", StringType)),
        resultSchema = StructType(Seq(
          StructField("tables_released", IntegerType, nullable = false)))) {
        args =>
          val n = graft.storage.Release
            .definition(warehouse, str(args, 0)).members.size
          graft.storage.Release.drop(
            SparkSession.active, warehouse, str(args, 0))
          Array[Any](n)
      })
      // CALL lake.create_branch('t', 'audit'): WRITABLE branch (Iceberg
      // ref) — the write-audit-publish surface. The branch is registered
      // as lake.default.<t>_branch_<name>, so the FULL SQL write surface
      // (INSERT / MERGE / UPDATE / DELETE / CALL maintenance) runs on it
      // while main readers stay on the audited snapshot; publish with
      // CALL lake.fast_forward('t', 'audit').
      case "create_branch" => Some(proc("create_branch",
        Seq(in("table", StringType), in("name", StringType)),
        resultSchema = StructType(Seq(
          StructField("fork_version", IntegerType, nullable = false)))) {
        args =>
          val tbl = str(args, 0)
          val bname = str(args, 1)
          val regName = s"${tbl}_branch_$bname"
          require(!LakeRegistry.entries(warehouse)
            .exists(_.table_name == regName),
            s"create_branch: table $regName already exists in the lake")
          val t = open(tbl)
          val b = t.createBranch(bname)
          LakeRegistry.register(warehouse,
            b.config.copy(tableName = regName), b.root.toString)
          Array[Any](t.branchForkVersion(bname))
      })
      // CALL lake.fast_forward('t', 'audit'): publish the branch head
      // onto main in one commit — loud if main moved since the fork
      case "fast_forward" => Some(proc("fast_forward",
        Seq(in("table", StringType), in("name", StringType)),
        resultSchema = versionResult) { args =>
        Array[Any](open(str(args, 0)).fastForward(str(args, 1)))
      })
      case "drop_branch" => Some(proc("drop_branch",
        Seq(in("table", StringType), in("name", StringType)),
        resultSchema = versionResult) { args =>
        val tbl = str(args, 0)
        val bname = str(args, 1)
        val t = open(tbl)
        t.dropBranch(bname)
        LakeRegistry.unregister(warehouse, s"${tbl}_branch_$bname")
        Array[Any](t.currentVersion)
      })
      // CALL lake.list_branches('t'): name + fork version per branch
      case "list_branches" => Some(procRows("list_branches",
        Seq(in("table", StringType)),
        resultSchema = StructType(Seq(
          StructField("branch", StringType, nullable = false),
          StructField("fork_version", IntegerType, nullable = false)))) {
        args =>
          val t = open(str(args, 0))
          t.branches.map(b => Array[Any](
            org.apache.spark.unsafe.types.UTF8String.fromString(b),
            t.branchForkVersion(b))).toArray
      })
      case "drop_tag" => Some(proc("drop_tag",
        Seq(in("table", StringType), in("name", StringType)),
        resultSchema = versionResult) { args =>
        val t = open(str(args, 0))
        t.dropTag(str(args, 1))
        Array[Any](t.currentVersion)
      })
      case "rollback" => Some(proc("rollback",
        Seq(in("table", StringType), in("version", IntegerType)),
        resultSchema = versionResult) { args =>
        Array[Any](open(str(args, 0)).rollbackTo(args.getInt(1)))
      })
      // CALL lake.clone('src', 'fork'): SHALLOW CLONE as SQL — hard-linked
      // zero-copy fork registered in the lake catalog under the new name,
      // immediately queryable as lake.default.<fork>
      case "clone" => Some(proc("clone",
        Seq(in("table", StringType), in("new_table", StringType)),
        resultSchema = versionResult) { args =>
        val newName = str(args, 1)
        require(!LakeRegistry.entries(warehouse)
          .exists(_.table_name == newName),
          s"clone: table $newName already exists in the lake catalog")
        val src = open(str(args, 0))
        val dest = java.nio.file.Paths.get(warehouse).resolve(newName)
        val forked = src.shallowClone(dest.toString, Some(newName))
        LakeRegistry.register(warehouse, forked.config, dest.toString)
        Array[Any](forked.currentVersion)
      })
      // CALL lake.diff('t', 1, 4): snapshot reconciliation — one row per
      // key whose row differs between the versions (added/removed/changed;
      // composite keys joined with '|'). Reads only files unique to one
      // manifest (CowTable.diffSnapshots); the result collects to the
      // driver like every CALL — for a diff expected to be huge, use the
      // DataFrame API directly.
      case "diff" => Some(procRows("diff",
        Seq(in("table", StringType),
          in("from_version", IntegerType),
          in("to_version", IntegerType)),
        resultSchema = StructType(Seq(
          StructField("key", StringType, nullable = true),
          StructField("change", StringType, nullable = false)))) { args =>
        val t = open(str(args, 0))
        val d = t.diffSnapshots(args.getInt(1), args.getInt(2))
        import org.apache.spark.sql.functions.{col, concat_ws}
        d.select(
          concat_ws("|", t.config.primaryKey.map(col): _*).as("key"),
          col("change"))
          .collect().map(r => Array[Any](
            org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)),
            org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1))))
      })
      case _ => None
    }
  }

  def list(): Array[Identifier] =
    All.map(n => Identifier.of(Array("default"), n)).toArray

  private def versionResult: StructType =
    StructType(Seq(StructField("version", IntegerType, nullable = false)))

  private def str(r: InternalRow, i: Int): String = {
    val v = r.getUTF8String(i)
    require(v != null, s"procedure argument $i must not be NULL")
    v.toString
  }

  private def in(name: String, dt: DataType,
      default: Option[String] = None): ProcedureParameter = {
    val b = ProcedureParameter.in(name, dt)
    default.foreach(b.defaultValue)
    b.build()
  }

  /** Multi-row variant of [[proc]]: body yields one Array[Any] per row. */
  private def procRows(procName: String, params: Seq[ProcedureParameter],
      resultSchema: StructType)(
      body: InternalRow => Array[Array[Any]]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft $procName procedure"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = s"graft $procName procedure"
          override def parameters(): Array[ProcedureParameter] =
            params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow)
              : java.util.Iterator[Scan] = {
            val out = body(input)
            java.util.List.of[Scan](new LocalScan {
              override def rows(): Array[InternalRow] =
                out.map(new GenericInternalRow(_))
              override def readSchema(): StructType = resultSchema
              override def description(): String = s"graft $procName result"
            }).iterator()
          }
        }
    }

  private def proc(procName: String, params: Seq[ProcedureParameter],
      resultSchema: StructType)(
      body: InternalRow => Array[Any]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft $procName procedure"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = s"graft $procName procedure"
          override def parameters(): Array[ProcedureParameter] =
            params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow)
              : java.util.Iterator[Scan] = {
            val out = body(input)
            java.util.List.of[Scan](new LocalScan {
              override def rows(): Array[InternalRow] =
                Array(new GenericInternalRow(out))
              override def readSchema(): StructType = resultSchema
              override def description(): String = s"graft $procName result"
            }).iterator()
          }
        }
    }
}
