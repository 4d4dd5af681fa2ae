package graft.sources

import graft.SparkSpec
import graft.storage.{CowTable, TableConfig}

class MdelDebugSpec extends SparkSpec {
  import spark.implicits._

  test("debug") {
    val dir = tmpDir("mdeldbg") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id"),
      partitionSpec = Some("day(ts)")))
    t.create((1 to 400).map { i =>
      (i.toLong, s"u${i % 7}",
        java.sql.Timestamp.valueOf(f"2024-01-${1 + (i - 1) * 20 / 400}%02d " +
          f"${i % 24}%02d:00:00"),
        i * 1.5)
    }.toDF("id", "user", "ts", "v"))
    spark.sql(s"CREATE TABLE mdel_dbg USING graft LOCATION '$dir'")
    try {
      val plan = spark.sessionState.executePlan(
        spark.sessionState.sqlParser.parsePlan(
          "DELETE FROM mdel_dbg WHERE ts < TIMESTAMP '2024-01-05 00:00:00'"))
        .optimizedPlan
      // scalastyle:off println
      println("== OPTIMIZED ==\n" + plan.treeString)
      // direct probe of the coverage evaluator
      val m = t.manifest(t.currentVersion)
      val schema = CowTable.structFromJson(m.schemaJson)
      val f = org.apache.spark.sql.sources.LessThan("ts",
        java.sql.Timestamp.valueOf("2024-01-05 00:00:00"))
      println("covered (Timestamp lit): " +
        MetadataDelete.coveredFiles(m, schema, Seq(f)))
      val f2 = org.apache.spark.sql.sources.LessThan("ts",
        java.time.LocalDateTime.parse("2024-01-05T00:00:00")
          .toInstant(java.time.ZoneOffset.UTC))
      println("covered (Instant lit): " +
        MetadataDelete.coveredFiles(m, schema, Seq(f2)))
      // scalastyle:on println
    } finally spark.sql("DROP TABLE IF EXISTS mdel_dbg")
  }
}
