package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SeqPackSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 500L)
    .map(i => (i, 50L + (i * 37) % 400)) // varied costs, deterministic
    .toDF("doc_id", "cost")

  test("distributed packing equals the single-window formulation") {
    val packed = SeqPack.packBins(docs, "doc_id", "cost", budget = 1000L,
      partitions = 7)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = docs
      .withColumn("bin", floor(
        coalesce(sum($"cost").over(w), lit(0L)) / lit(1000.0)).cast("long"))
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    assert(packed == naive)
    // sanity on the shape: bins are contiguous from 0 and multi-doc
    assert(packed.values.min == 0L)
    assert(packed.values.toSet.size > 10)
  }

  test("no single-partition global window in the plan") {
    val packed = SeqPack.packBins(docs, "doc_id", "cost", budget = 1000L,
      partitions = 7)
    val plan = packed.queryExecution.executedPlan.toString
    // the window must be partitioned (by __pid), never empty-partitioned
    assert(!plan.contains("Window [") ||
      plan.linesIterator.filter(_.contains("windowspecdefinition"))
        .forall(_.contains("__pid")), plan)
    assert(packed.count() == 500L)
  }

  test("null costs are rejected loudly (no silent bin skew, no NPE)") {
    // an all-null partition makes sum() NULL (NPE in the offsets pass);
    // scattered nulls silently skew budgets — both must fail loud instead
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(20L)))
      .toDF("doc_id", "cost")
    val e = intercept[IllegalArgumentException] {
      SeqPack.packBins(df, "doc_id", "cost", budget = 100L, partitions = 2)
    }
    assert(e.getMessage.contains("null"), e.getMessage)
  }

  test("a document larger than the budget gets its own bin boundary") {
    val df = Seq((1L, 10L), (2L, 5000L), (3L, 10L)).toDF("doc_id", "cost")
    val bins = SeqPack.packBins(df, "doc_id", "cost", budget = 100L,
      partitions = 2)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    assert(bins(1L) == 0L)
    assert(bins(2L) == 0L)  // starts in bin 0 (exclusive prefix = 10)
    assert(bins(3L) == 50L) // lands after the giant: floor(5010/100)
  }
}
