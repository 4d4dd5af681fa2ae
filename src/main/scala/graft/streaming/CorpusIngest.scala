package graft.streaming

import graft.storage.CowTable
import graft.text.{TextFunctions, TextStats}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming corpus ingestion: the end-to-end LLM-data front door — a
  * document stream flows through quality scoring → filter → exact dedup →
  * transactional upsert into a COW table, micro-batch by micro-batch.
  *
  * The dedup-merge is CONVERGENT (commutative + idempotent): the table is
  * keyed on the 48-bit text hash and a row only lands if its hash is new
  * OR its doc_id is smaller than the incumbent's ("first" duplicate wins,
  * with the deterministic min-id tiebreak rather than arrival order). Min
  * over any grouping order is the global min, so the final table state is
  * a pure function of the input SET — independent of how the file source
  * batches it, of micro-batch order, and of replays. That is what makes a
  * STREAMING ingest oracle-checkable by a batch SQL engine.
  *
  * Scale shape: per batch, work is O(batch) plus the existing-key lookup —
  * the table side is column-pruned to `(text_hash, doc_id)` and semi-join
  * restricted to the batch's hashes (broadcast — a micro-batch is small by
  * construction), so the table scan prunes by key-range stats rather than
  * reading the corpus. The upsert itself rewrites only files whose key
  * range overlaps the batch ([[CowTable.upsert]] pruning).
  */
object CorpusIngest {

  /** Drain `srcDir` (parquet document files) into `table` with
    * Trigger.AvailableNow. Schema must contain `doc_id` and `text`. */
  def runAvailableNow(
      spark: SparkSession, table: CowTable, srcDir: String,
      checkpointDir: String, schema: StructType, minQuality: Double,
      maxFilesPerTrigger: Int = 2): Unit = {
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) applyBatch(table, batch, minQuality): Unit
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One micro-batch: score → filter → batch-local dedup → conditional
    * merge (new hash, or smaller doc_id than the incumbent). */
  def applyBatch(
      table: CowTable, batch: DataFrame, minQuality: Double): Int = {
    val scored = batch
      .withColumn("quality", TextStats.qualityScore(col("text")))
      .filter(col("quality") >= lit(minQuality))
      .withColumn("text_hash", TextFunctions.md5Hash48(col("text")))
    // batch-local winner per hash: min doc_id (same tiebreak as the merge)
    val w = Window.partitionBy("text_hash").orderBy("doc_id")
    val batchWinners = scored
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .drop("rn")
    val winners =
      if (table.currentVersion == 0) batchWinners
      else {
        val batchHashes = batchWinners.select("text_hash").distinct()
        val incumbent = table.read()
          .join(broadcast(batchHashes), Seq("text_hash"), "left_semi")
          .select(col("text_hash"), col("doc_id").as("incumbent_doc_id"))
        batchWinners.join(incumbent, Seq("text_hash"), "left")
          .filter(col("incumbent_doc_id").isNull ||
            col("doc_id") < col("incumbent_doc_id"))
          .drop("incumbent_doc_id")
      }
    if (winners.isEmpty) table.currentVersion else table.upsert(winners)
  }
}
