package graft.sources

import graft.SparkSpec

class FormatSinksSpec extends SparkSpec {
  import spark.implicits._

  test("csv round-trip preserves padded strings, empty strings, and nulls") {
    val dir = tmpDir("csv") + "/t"
    val df = Seq(
      (1L, Some(" padded "), 1.5),
      (2L, Some(""), -0.25),
      (3L, None, 0.0),
      (4L, Some("comma, \"quote\"\nnewline"), 2.0))
      .toDF("id", "s", "v")
    FormatSinks.writeCsv(df, dir)
    val back = FormatSinks.readCsv(spark, dir, df.schema)
    assert(back.as[(Long, Option[String], Double)].collect().toSet ==
      df.as[(Long, Option[String], Double)].collect().toSet)
  }

  test("json-lines round-trip preserves padded and empty strings") {
    val dir = tmpDir("json") + "/t"
    val df = Seq((1L, " padded "), (2L, ""), (3L, "uni ✓ code"))
      .toDF("id", "s")
    FormatSinks.writeJsonLines(df, dir)
    val back = FormatSinks.readJsonLines(spark, dir, df.schema)
    assert(back.as[(Long, String)].collect().toSet ==
      df.as[(Long, String)].collect().toSet)
  }
}
