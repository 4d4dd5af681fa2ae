package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV / JSON-lines sinks and scans — source formats beyond the reference's
  * parquet-only surface (reference scans are parquet, e.g.
  * src/iceberg/iceberg-initial-load.py:54-55; its `header` option is a CSV
  * carry-over, which is the format this module actually serves).
  *
  * Both formats are schema-on-read: the writer emits a distributed multi-part
  * directory (one file per partition — the 100 TB shape; never a single-file
  * collect), the reader applies an EXPLICIT schema so types survive the text
  * round-trip (inference is a second full scan and nondeterministic for
  * empty/all-null columns).
  */
object FormatSinks {

  def writeCsv(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      // quote/escape defaults handle embedded commas/newlines; timestamps
      // written as ISO-8601 so the read side parses them losslessly
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(dir)

  def readCsv(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .schema(schema)
      .csv(dir)

  def writeJsonLines(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .json(dir)

  def readJsonLines(
      spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .schema(schema)
      .json(dir)
}
