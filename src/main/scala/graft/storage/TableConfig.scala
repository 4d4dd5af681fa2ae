package graft.storage

/** Per-table behavioral metadata — the typed equivalent of the reference's
  * `target_tables_list` config entries (reference: cdk.json:61-86, parsed with
  * `ast.literal_eval` at src/hudi/hudi-initial-load.py:118-124).
  *
  * The reference encodes "no partition key" as the sentinel string "None"
  * (src/hudi/hudi-initial-load.py:68); here that is `Option.empty` by
  * construction.
  *
  * @param primaryKey    merge/dedup key columns (reference `primary_key`)
  * @param partitionKey  hive-style partition column, if any (`partition_key`)
  * @param precombineKey tie-break column for same-timestamp CDC rows
  *                      (`precombine_key`); None reproduces the reference's
  *                      keep-all-tied-rows behavior (SURVEY.md §2.2)
  * @param clusterByKey  range-cluster rows on the primary key at write time,
  *                      so data files carry DISJOINT key ranges and merge
  *                      pruning touches the minimum file set (the engine's
  *                      analog of the reference's INSERT ... ORDER BY
  *                      clustering, src/iceberg/iceberg-initial-load.py:87-92,
  *                      applied to every snapshot write)
  * @param maxRecordsPerFile upper bound on rows per data file (0 = Spark
  *                      default, unbounded): caps file size so a skewed
  *                      partition value or a giant merge rewrite can't
  *                      produce multi-GB files that defeat task-level
  *                      parallelism on later reads
  * @param bloomIndex    build a per-file Bloom filter of the leading key
  *                      column at commit time (a `<file>.bloom` sidecar,
  *                      written executor-side) and use it as a third merge-
  *                      pruning stage after min/max range checks — Hudi's
  *                      default BLOOM index re-expressed. Pays one extra
  *                      key-column pass per commit's NEW files; wins when
  *                      keys are scattered (range-overlapping files that
  *                      point lookups would otherwise always touch).
  *                      False positives only ⇒ never a wrong skip.
  * @param statsColumns  extra columns to footer-stat per file (min/max in
  *                      the manifest) beyond the always-statted key columns
  *                      — the Delta "dataSkippingNumIndexedCols" analog.
  *                      DSv2 scans then skip files on range/equality
  *                      predicates over these columns (e.g. an event-time
  *                      column on an append-only log). Footer-read only:
  *                      no extra data IO at commit.
  */
final case class TableConfig(
    tableName: String,
    primaryKey: Seq[String],
    partitionKey: Option[String] = None,
    precombineKey: Option[String] = None,
    clusterByKey: Boolean = false,
    maxRecordsPerFile: Long = 0L,
    bloomIndex: Boolean = false,
    statsColumns: Seq[String] = Nil,
    /** Materialize each upsert/delete commit's exact change rows (with a
      * physical `_change_type`) into a per-commit `_cdc/` dir referenced by
      * the manifest — Delta's enableChangeDataFeed. The change feed then
      * reads them directly: ROW-exact (no same-file false positives from
      * rewritten neighbors) and join-free per commit. Costs one extra write
      * of O(changed rows) per mutation. Commits made without the flag (or
      * through the DSv2 row-level path) fall back to the file-diff join. */
    changeDataFeed: Boolean = false,
    /** CHECK constraints (Delta `ADD CONSTRAINT` invariants): SQL boolean
      * expressions every written row must satisfy — a row where one
      * evaluates false OR NULL rejects the whole write loudly, naming the
      * constraint and a violating row. Every path — batch API, DSv2
      * connector (INSERT/CTAS/MERGE/UPDATE), streaming epochs — validates
      * the freshly WRITTEN files before the commit: one parallel scan of
      * the NEW data only (never the table, never a second run of the input
      * plan), and a violation leaves only unreferenced files. Durable:
      * carried in manifests like the other properties, so later writers
      * inherit it. */
    checkConstraints: Seq[String] = Nil,
    /** MERGE-ON-READ writes via deletion vectors (Delta DV / Iceberg
      * positional deletes): `delete()` marks row positions in a parquet
      * sidecar instead of rewriting the touched files — O(matched rows)
      * write cost regardless of file size — and `upsert()` marks the
      * matched preimage positions + APPENDS the batch (O(batch), Delta's
      * DV-update shape; precombine tables and schema-evolving batches
      * fall back to the COW rewrite with identical results). Readers
      * subtract the positions; a COW rewrite (compact,
      * [[CowTable.purgeDeletionVectors]], fallback upsert)
      * materializes the subtraction. Requires [[changeDataFeed]] (the
      * manifest file-diff cannot see an in-place DV change, so tombstones
      * must be materialized at delete time). SQL `DELETE FROM` through the
      * DSv2 row-level path keeps its COW group rewrite (results identical —
      * scans are DV-aware either way); the API `delete()` is the
      * DV-accelerated path. */
    deletionVectors: Boolean = false,
    /** Iceberg-style PARTITION TRANSFORM spec — `day(c)`, `month(c)`,
      * `bucket(N,c)`, `truncate(W,c)` ([[PartitionTransform]]): the table
      * is hive-partitioned on a GENERATED column derived from `c`
      * (Delta generated-column semantics: the column is part of the
      * schema, recomputed inside the commit funnel so writers can never
      * drift it), and scans derive partition pruning from predicates on
      * `c` itself — hidden partitioning. Mutually exclusive with an
      * identity [[partitionKey]]; the effective partition key becomes the
      * generated column's name. Every mutation path recomputes the
      * generated column — the CowTable funnel for API writes, the
      * [[graft.sources.TransformRecompute]] plan rule for SQL/connector
      * writes INCLUDING the deletion-vector delta path (its appended
      * update/insert files carry re-derived values and land in the
      * derived hive dirs), and a bound per-row recompute inside the
      * STREAMING sink's writer (epoch write plans bypass optimizer
      * rules). */
    partitionSpec: Option[String] = None,
    /** Per-file K-MINIMUM-VALUES NDV sketches over [[statsColumns]]
      * ([[graft.functions.KmvSketch]], k = [[CowTable.NdvK]]): one extra
      * column-pruned pass over each commit's FRESH files at write time, in
      * exchange for join-reorder-grade distinct counts on non-key columns
      * at plan time (CBO's `distinctCount`), merged exactly over whatever
      * file subset pruning kept. Opt-in: the write-side pass is real IO. */
    ndvSketch: Boolean = false) {
  require(primaryKey.nonEmpty, s"table $tableName needs >=1 primary key column")
  require(!deletionVectors || changeDataFeed,
    s"table $tableName: deletionVectors requires changeDataFeed " +
      "(DV commits change no file paths, so the change feed must be " +
      "materialized at delete time to stay exact)")
  require(partitionSpec.isEmpty || partitionKey.isEmpty ||
    partitionKey == partitionSpec.map(PartitionTransform.parse(_).name),
    s"table $tableName: partitionSpec and partitionKey are mutually " +
      "exclusive (the transform's generated column IS the partition key)")
  partitionSpec.foreach(PartitionTransform.parse) // loud on a bad spec

  /** Parsed transform, when configured. */
  def partitionTransform: Option[PartitionTransform] =
    partitionSpec.map(PartitionTransform.parse)
}
