package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  test("flags exactly the rows beyond the rational threshold, exact z") {
    // stratum A: nine 10s and one 100 — the 100 is the outlier.
    // n=10, s=190, ss=10900; num(100) = 1000-190 = 810;
    // dd = 109000 - 36100 = 72900; z = 810/sqrt(72900) = 810/270 = 3
    val df = ((1 to 9).map(i => (i.toLong, "A", 10)) :+ ((10L, "A", 100)))
      .toDF("id", "lang", "n")
    val out = Outliers.zOutliers(df, "lang", "n", tNum = 2)
      .select("id", "z").as[(Long, Double)].collect().toMap
    assert(out.keySet == Set(10L))
    assert(out(10L) == 3.0)
  }

  test("rational threshold: 3/2 catches what 2 misses") {
    // uniform-ish values never exceed |z| = sqrt(3) < 2
    val df = (1 to 100).map(i => (i.toLong, "u", i)).toDF("id", "lang", "n")
    assert(Outliers.zOutliers(df, "lang", "n", tNum = 2).count() == 0)
    val mild = Outliers.zOutliers(df, "lang", "n", tNum = 3, tDen = 2)
      .select("id").as[Long].collect().toSet
    assert(mild.nonEmpty)
    // symmetric: both tails flagged
    assert(mild.exists(_ <= 10) && mild.exists(_ >= 91))
  }

  test("zero-variance strata emit nothing (no divide-by-zero)") {
    val df = Seq((1L, "c", 5), (2L, "c", 5), (3L, "c", 5))
      .toDF("id", "lang", "n")
    assert(Outliers.zOutliers(df, "lang", "n", tNum = 1).count() == 0)
  }

  test("strata are independent and the plan broadcasts the moments") {
    val df = ((1 to 20).map(i => (i.toLong, "a", 10)) ++
      Seq((21L, "a", 500)) ++
      (31 to 50).map(i => (i.toLong, "b", 500))) // 500 is normal in b
      .toDF("id", "lang", "n")
    val out = Outliers.zOutliers(df, "lang", "n", tNum = 2)
    assert(out.select("id").as[Long].collect().toSet == Set(21L))
    assert(out.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
  }

  test("bad thresholds are rejected") {
    val df = Seq((1L, "a", 1)).toDF("id", "lang", "n")
    intercept[IllegalArgumentException] {
      Outliers.zOutliers(df, "lang", "n", tNum = 0)
    }
  }
}
