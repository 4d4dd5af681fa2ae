package graft.streaming

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
}
