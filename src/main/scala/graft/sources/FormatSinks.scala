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
      // written as ISO-8601 so the read side parses them losslessly.
      // Whitespace trimming is OFF both sides (write-side default trims!)
      // and "" is written quoted so it survives as empty, not null — without
      // these, " padded " and "" silently break the exact round-trip.
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      // nulls get a distinct sentinel: CSV cannot otherwise distinguish a
      // null cell from an empty string (both read back as null). Known
      // limit: a string cell whose VALUE is exactly the two characters \N
      // round-trips as null (Spark CSV offers no sentinel escaping) — pick
      // another sentinel via this option if that collides with your data.
      .option("nullValue", "\\N")
      .option("emptyValue", "\"\"")
      .csv(dir)

  def readCsv(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("nullValue", "\\N")
      // quoted embedded newlines span physical lines — without multiLine the
      // line-based reader tears such records. Parallelism note: multiLine
      // parses each FILE whole, so split-level parallelism comes from the
      // many part files the writer emits, not intra-file splits.
      .option("multiLine", "true")
      .schema(schema)
      .csv(dir)

  /** ORC: the other columnar format Spark ships natively — vectorized
    * reader, predicate pushdown, and type fidelity for free, so the
    * round-trip needs no options at all. */
  def writeOrc(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").orc(dir)

  def readOrc(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(dir)

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
