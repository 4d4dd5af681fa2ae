package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def probeDf = (1L to 5000L).map(i => (i, s"row$i"))
    .toDF("k", "payload")
  private def buildDf = (1L to 5000L).filter(_ % 97 == 0).map(i => (i, "d"))
    .toDF("bk", "attr")

  test("result is exactly the plain leftsemi join (no false negatives)") {
    val expected = probeDf
      .join(buildDf.select($"bk".as("k")), Seq("k"), "leftsemi")
      .as[(Long, String)].collect().toSet
    val got = BloomJoin.semiJoin(probeDf, buildDf, "k", "bk")
      .as[(Long, String)].collect().toSet
    assert(got == expected && expected.size == 5000 / 97)
  }

  test("the prefilter genuinely prunes (and keeps every true match)") {
    val bits = BloomJoin.buildBits(buildDf, "bk")
    val kept = BloomJoin
      .prefilter(probeDf, "k", bits, numHashes = 4, mBits = 1 << 16)
      .select("k").as[Long].collect().toSet
    val trueKeys = (1L to 5000L).filter(_ % 97 == 0).toSet
    assert(trueKeys.subsetOf(kept), "bloom dropped a true match")
    // 51 keys in a 65536-bit filter: FP rate ~ (1-e^{-4*51/65536})^4 ~ 1e-10;
    // anything beyond a handful of survivors means the filter is broken
    assert(kept.size < 200,
      s"bloom pruned nothing: ${kept.size} of 5000 rows survived")
  }

  test("prefilter is a shuffle-free projection over the probe side") {
    val bits = BloomJoin.buildBits(buildDf, "bk")
    val plan = BloomJoin
      .prefilter(probeDf, "k", bits, numHashes = 4, mBits = 1 << 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("string keys and empty build side work") {
    val p = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    val b = Seq(("b", 0)).toDF("bk", "w")
    assert(BloomJoin.semiJoin(p, b, "k", "bk").as[(String, Int)]
      .collect().toSeq == Seq(("b", 2)))
    val none = b.filter($"bk" === "zzz")
    assert(BloomJoin.semiJoin(p, none, "k", "bk").count() == 0)
  }

  test("bad parameters are rejected") {
    intercept[IllegalArgumentException] {
      BloomJoin.buildBits(buildDf, "bk", mBits = 1000) // not a power of two
    }
    intercept[IllegalArgumentException] {
      BloomJoin.buildBits(buildDf, "bk", numHashes = 0)
    }
  }
}
