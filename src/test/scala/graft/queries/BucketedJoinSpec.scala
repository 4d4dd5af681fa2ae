package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without shuffling either side") {
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("spec_cust_b", "spec_ord_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.storage.CowTable.deleteRecursively(
        java.nio.file.Paths.get(wh, t))
    }
    (1L to 200L).map(i => (i, s"c$i")).toDF("ck", "name")
      .write.bucketBy(4, "ck").sortBy("ck").saveAsTable("spec_cust_b")
    (1L to 1000L).map(i => (i, i % 200 + 1, i * 1.5)).toDF("ok", "ck", "v")
      .write.bucketBy(4, "ck").sortBy("ck").saveAsTable("spec_ord_b")
    // hint forces sort-merge (tiny test tables would broadcast, which
    // bypasses bucketing entirely) — at fact⋈fact scale SMJ is the default
    val joined = spark.table("spec_cust_b").hint("merge")
      .join(spark.table("spec_ord_b"), "ck")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // co-located buckets: a sort-merge join with NO Exchange on either side
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), s"expected shuffle-free join:\n$plan")
    assert(joined.count() == 1000)
  }
}
