package graft.queries

import graft.core.{Q, Tables}
import graft.sources.FormatSinks
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source-format coverage beyond parquet: CSV and JSON-lines round-trips.
  * Each query writes a test table through the format sink (distributed
  * multi-part write) and reads it back with an explicit schema — the result
  * must equal the original table exactly, so the oracle is the identity
  * SELECT over the parquet-loaded table.
  */
object SourceFormatQueries {
  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.table(s, d, n)

  val all: Seq[Q] = Seq(

    // CSV sink + scan: quoted strings (comments carry commas), typed
    // read-back via explicit schema.
    Q("q57_csv_roundtrip",
      "SELECT * FROM nation") { (s, d) =>
      val df = t(s, d, "nation")
      val dir = StorageQueries.tableDir("q57_csv")
      FormatSinks.writeCsv(df, dir)
      FormatSinks.readCsv(s, dir, df.schema)
    },

    // JSON-lines sink + scan: schema-on-read keeps longs/doubles typed.
    Q("q58_json_roundtrip",
      "SELECT * FROM supplier") { (s, d) =>
      val df = t(s, d, "supplier")
      val dir = StorageQueries.tableDir("q58_json")
      FormatSinks.writeJsonLines(df, dir)
      FormatSinks.readJsonLines(s, dir, df.schema)
    },

    // ORC sink + scan: Spark's second native columnar format — vectorized,
    // pushdown-capable, exact round-trip with no options.
    Q("q76_orc_roundtrip",
      "SELECT * FROM part") { (s, d) =>
      val df = t(s, d, "part")
      val dir = StorageQueries.tableDir("q76_orc")
      FormatSinks.writeOrc(df, dir)
      FormatSinks.readOrc(s, dir, df.schema)
    })
}
