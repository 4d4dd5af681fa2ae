package graft.sources

import graft.SparkSpec
import graft.storage.{CowTable, TableConfig}
import org.apache.spark.sql.functions._

class StatsColumnsSpec extends SparkSpec {
  import spark.implicits._

  /** 4 files with disjoint ts ranges (range-shaped input survives the
    * unpartitioned, unclustered writer as-is). */
  private def mkTable(dir: String): CowTable = {
    val cfg = TableConfig("ev", Seq("id"), statsColumns = Seq("ts", "kind"))
    val t = CowTable(spark, dir + "/t", cfg)
    val df = (0L until 400L).map { i =>
      (i, java.sql.Timestamp.valueOf(f"2024-01-${i / 100 + 1}%02d 00:00:00"),
        s"k${i / 100}")
    }.toDF("id", "ts", "kind")
    t.create(df.repartitionByRange(4, $"ts"))
    t
  }

  test("manifest carries extra min/max for statsColumns") {
    val dir = tmpDir("stats")
    val t = mkTable(dir)
    val m = t.manifest(t.currentVersion)
    assert(m.files.size == 4)
    m.files.foreach { e =>
      assert(e.extra.contains("ts") && e.extra.contains("kind"), e)
      assert(e.extra("ts").mn.isDefined && e.extra("ts").mx.isDefined)
    }
  }

  test("timestamp range filter skips files at the manifest level") {
    val dir = tmpDir("stats")
    mkTable(dir)
    val scan = spark.read.format("graft").load(dir + "/t")
      .filter($"ts" >= "2024-01-03 00:00:00" && $"ts" < "2024-01-04 00:00:00")
    assert(scan.count() == 100L)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("statsColFilters=2"), plan)
    // day-3's file plus its neighbor: the strict `<` bound prunes as
    // inclusive (conservative by design) and day-4's min sits exactly on
    // the boundary — the residual filter restores exactness
    assert(plan.contains("files=2/4"), plan)
  }

  test("string column equality skips via UTF8 footer stats") {
    val dir = tmpDir("stats")
    mkTable(dir)
    val scan = spark.read.format("graft").load(dir + "/t")
      .filter($"kind" === "k2")
    assert(scan.count() == 100L)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("files=1/4"), plan)
  }

  test("columns without stats never skip (conservative)") {
    val dir = tmpDir("stats")
    // same data, NO statsColumns: the ts filter reads all files but stays
    // exact
    val t = CowTable(spark, dir + "/t", TableConfig("ev", Seq("id")))
    val df = (0L until 400L).map { i =>
      (i, java.sql.Timestamp.valueOf(f"2024-01-${i / 100 + 1}%02d 00:00:00"),
        s"k${i / 100}")
    }.toDF("id", "ts", "kind")
    t.create(df.repartitionByRange(4, $"ts"))
    val scan = spark.read.format("graft").load(dir + "/t")
      .filter($"ts" >= "2024-01-03 00:00:00" && $"ts" < "2024-01-04 00:00:00")
    assert(scan.count() == 100L)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("files=4/4"), plan)
  }
}
