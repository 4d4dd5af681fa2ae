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
  */
final case class TableConfig(
    tableName: String,
    primaryKey: Seq[String],
    partitionKey: Option[String] = None,
    precombineKey: Option[String] = None) {
  require(primaryKey.nonEmpty, s"table $tableName needs >=1 primary key column")
}
