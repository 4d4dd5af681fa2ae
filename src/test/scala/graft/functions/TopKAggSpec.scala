package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def rows = ((1 to 100).map(i => (i.toLong, "a", (i % 10).toLong))
    ++ (1 to 50).map(i => (1000L + i, "b", i.toLong)))
    .toDF("id", "g", "score")

  private def viaWindow(k: Int) = {
    import org.apache.spark.sql.expressions.Window
    rows.withColumn("rn", row_number().over(
      Window.partitionBy("g").orderBy($"score".desc, $"id")))
      .filter($"rn" <= k).select("g", "id", "score")
      .as[(String, Long, Long)].collect().toSet
  }

  private def viaAgg(k: Int) =
    rows.groupBy("g").agg(TopKAgg.topK($"score", $"id", k).as("top"))
      .select($"g", explode($"top").as("t"))
      .select($"g", $"t._2".as("id"), $"t._1".as("score"))
      .as[(String, Long, Long)].collect().toSet

  test("equals the window formulation, including ties broken by id") {
    for (k <- Seq(1, 3, 7)) assert(viaAgg(k) == viaWindow(k), s"k=$k")
  }

  test("deterministic under repartitioning") {
    val k = 5
    val a = rows.repartition(13).groupBy("g")
      .agg(TopKAgg.topK($"score", $"id", k).as("top"))
      .select($"g", $"top").as[(String, Seq[(Long, Long)])]
      .collect().toMap
    val b = rows.repartition(3).groupBy("g")
      .agg(TopKAgg.topK($"score", $"id", k).as("top"))
      .select($"g", $"top").as[(String, Seq[(Long, Long)])]
      .collect().toMap
    assert(a == b)
    // ordered inside the array: score desc, id asc
    assert(a("a").map(_._1).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("groups smaller than k return all their rows") {
    val df = Seq((1L, "x", 5L), (2L, "x", 9L)).toDF("id", "g", "score")
    val out = df.groupBy("g").agg(TopKAgg.topK($"score", $"id", 10).as("t"))
      .select(explode($"t").as("e")).select($"e._1", $"e._2")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((9L, 2L), (5L, 1L)))
  }

  test("plan is an aggregate, not a window sort") {
    val plan = rows.groupBy("g")
      .agg(TopKAgg.topK($"score", $"id", 3).as("t"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("insert/merge unit behavior at the cap") {
    val a = Array((9L, 1L), (7L, 2L), (7L, 5L))
    assert(TopKAgg.insert(a, 8L, 9L, 3).toSeq ==
      Seq((9L, 1L), (8L, 9L), (7L, 2L)))
    assert(TopKAgg.insert(a, 1L, 9L, 3).toSeq == a.toSeq) // below the cap
    val m = TopKAgg.mergeSorted(a, Array((9L, 0L), (7L, 3L)), 3)
    assert(m.toSeq == Seq((9L, 0L), (9L, 1L), (7L, 2L)))
    intercept[IllegalArgumentException] { new TopKAgg.Agg(0) }
  }
}
