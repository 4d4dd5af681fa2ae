package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  private def tokens(rows: (String, Int)*): Seq[String] =
    rows.flatMap { case (w, n) => Seq.fill(n)(w) }

  test("exact regime (cap >= distinct): equals groupBy counts, " +
    "partition-independent") {
    val data = tokens("join" -> 90, "scan" -> 50, "hash" -> 30,
      "sort" -> 10, "agg" -> 1)
    def run(parts: Int) =
      data.toDF("w").repartition(parts)
        .agg(SpaceSaving.topTokens(col("w"), cap = 16).as("m"))
        .select(explode(col("m"))).as[(String, Long)].collect().toMap
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(run(1) == exact)
    assert(run(7) == exact)
  }

  test("overflow regime: cap respected, counts are upper bounds, " +
    "true heavy hitter survives") {
    // one dominant key + a long tail wider than the cap
    val data = tokens("heavy" -> 500) ++
      (1 to 200).flatMap(i => Seq.fill(2)(s"tail$i"))
    val m = data.toDF("w").repartition(1) // sequential fold
      .agg(SpaceSaving.topTokens(col("w"), cap = 32).as("m"))
      .select(explode(col("m"))).as[(String, Long)].collect().toMap
    assert(m.size <= 32)
    assert(m.contains("heavy"))
    // space-saving counts never underestimate a surviving key's true count
    assert(m("heavy") >= 500L)
  }

  test("merge: union-sum in the exact regime, truncation under overflow") {
    val a = Map("x" -> 5L, "y" -> 3L)
    val b = Map("y" -> 2L, "z" -> 7L)
    assert(SpaceSaving.mergeSummaries(a, b, cap = 8) ==
      Map("x" -> 5L, "y" -> 5L, "z" -> 7L))
    // x and y tie at 5 after the sum: count desc then key asc keeps x
    assert(SpaceSaving.mergeSummaries(a, b, cap = 2) ==
      Map("z" -> 7L, "x" -> 5L))
    // deterministic tie-break at the truncation boundary: count desc, key asc
    assert(SpaceSaving.mergeSummaries(
      Map("b" -> 5L, "a" -> 5L), Map("c" -> 5L), cap = 2) ==
      Map("a" -> 5L, "b" -> 5L))
  }

  test("eviction picks min count with largest-key tie-break") {
    assert(SpaceSaving.evictKey(Map("a" -> 2L, "b" -> 1L, "c" -> 1L)) == "c")
    val buf = SpaceSaving.reduceOne(
      Map("a" -> 2L, "b" -> 1L), "new", cap = 2)
    assert(buf == Map("a" -> 2L, "new" -> 2L)) // inherits min+1
  }

  test("cap must be positive") {
    intercept[IllegalArgumentException] { new SpaceSaving.Agg(0) }
  }
}
