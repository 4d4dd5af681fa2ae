package graft.streaming

import graft.operators.Scd2
import graft.pipeline.CdcPipeline
import graft.storage.CowTable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.current_timestamp
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Structured-Streaming variant of the CDC job: the file-source checkpoint
  * plays the bookmark's role (SURVEY.md §1.7's alternative mapping of Glue
  * job bookmarks — readStream + Trigger.AvailableNow), and each micro-batch
  * flows through the same dedup→route→merge pipeline via foreachBatch.
  *
  * `maxFilesPerTrigger=1` keeps micro-batches file-ordered (oldest mtime
  * first), which is what makes sequential apply converge to the single-batch
  * result for time-ordered CDC logs (CdcPipelineSpec's prefix property).
  * AvailableNow drains everything available, then terminates — the
  * scheduled-micro-batch shape of the reference's hourly trigger without a
  * long-running daemon.
  */
object CdcStream {

  def runAvailableNow(
      spark: SparkSession, table: CowTable, cdcDir: String,
      checkpointDir: String, schema: StructType,
      opCol: String = "Op", tsCol: String = "timestamp",
      auditTs: Column = current_timestamp(),
      oneFilePerBatch: Boolean = true): Unit = {
    val reader = spark.readStream.schema(schema)
    val src =
      (if (oneFilePerBatch) reader.option("maxFilesPerTrigger", 1)
       else reader).parquet(cdcDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          CdcPipeline.applyBatch(table, batch, opCol, tsCol, auditTs): Unit
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The same drain maintaining an SCD2 HISTORY table
    * ([[Scd2.applyBatch]] per micro-batch) instead of the latest-state
    * MERGE — the continuous "CDC stream → versioned dimension" deployment.
    * Unlike [[runAvailableNow]], file order is IRRELEVANT here: SCD2's
    * final state is a pure function of the event SET (late batches replay
    * only the affected keys), so this drain converges to the one-shot
    * history for ANY micro-batch partitioning of the log — which is why
    * it defaults to whatever batching the file source picks. */
  def runScd2AvailableNow(
      spark: SparkSession, table: CowTable, cdcDir: String,
      checkpointDir: String, schema: StructType, keyCols: Seq[String],
      tsCol: String = "timestamp", opCol: String = "Op",
      tieBreak: Seq[String] = Seq("event_id"),
      oneFilePerBatch: Boolean = true): Unit = {
    val reader = spark.readStream.schema(schema)
    val src =
      (if (oneFilePerBatch) reader.option("maxFilesPerTrigger", 1)
       else reader).parquet(cdcDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          Scd2.applyBatch(table, batch, keyCols, tsCol, opCol, tieBreak): Unit
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
