package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exhaustive sample (k >= n) reproduces exact PERCENTILE_CONT") {
    val df = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "v")
      .withColumn("__h", graft.text.TextFunctions.md5Hash48($"id".cast("string")))
    val got = df.agg(QuantileSketch.sketchQuantiles(
      $"__h", $"v", 1000, Seq(0.5, 0.95)).as("q"))
      .select($"q".getItem(0), $"q".getItem(1)).as[(Double, Double)].head()
    val exact = df.agg(
      expr("percentile(v, 0.5)"), expr("percentile(v, 0.95)"))
      .as[(Double, Double)].head()
    assert(got == exact, s"$got vs $exact")
  }

  test("deterministic and partition-independent under k < n") {
    val df = (1L to 5000L).map(i => (i, (i * 37 % 1000).toDouble))
      .toDF("id", "v")
      .withColumn("__h", graft.text.TextFunctions.md5Hash48($"id".cast("string")))
    def run(parts: Int): (Double, Double) =
      df.repartition(parts).agg(QuantileSketch.sketchQuantiles(
        $"__h", $"v", 256, Seq(0.5, 0.95)).as("q"))
        .select($"q".getItem(0), $"q".getItem(1)).as[(Double, Double)].head()
    val a = run(1)
    val b = run(7)
    val c = run(32)
    assert(a == b && b == c, s"$a / $b / $c")
    // and the sample really is a quantile estimate, not garbage: the exact
    // p50 of this uniform-ish distribution is ~500, p95 ~950
    assert(math.abs(a._1 - 500) < 100 && math.abs(a._2 - 950) < 60, a)
  }

  test("merge keeps duplicate (hash, value) pairs (multiset top-k)") {
    val a = (Array(1L, 5L), Array(1.0, 5.0))
    val b = (Array(1L, 3L), Array(1.0, 3.0))
    val m = QuantileSketch.mergeSorted(a, b, 10)
    assert(m._1.toSeq == Seq(1L, 1L, 3L, 5L), m._1.toSeq)
    assert(m._2.toSeq == Seq(1.0, 1.0, 3.0, 5.0), m._2.toSeq)
    // cap drops the largest pairs, never reorders
    val capped = QuantileSketch.mergeSorted(a, b, 3)
    assert(capped._1.toSeq == Seq(1L, 1L, 3L))
  }

  test("insert respects (hash, value) order with equal hashes") {
    var buf: QuantileSketch.Buf =
      (Array.emptyLongArray, Array.emptyDoubleArray)
    for ((h, v) <- Seq((7L, 2.0), (7L, 1.0), (3L, 9.0), (7L, 1.5)))
      buf = QuantileSketch.insert(buf, h, v, 3)
    assert(buf._1.toSeq == Seq(3L, 7L, 7L))
    assert(buf._2.toSeq == Seq(9.0, 1.0, 1.5))
  }
}
