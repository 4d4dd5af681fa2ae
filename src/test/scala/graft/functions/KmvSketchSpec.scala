package graft.functions

import graft.SparkSpec
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("insert keeps the k smallest, sorted and distinct") {
    var buf = Array.emptyLongArray
    Seq(50L, 10L, 30L, 10L, 70L, 20L).foreach(h =>
      buf = KmvSketch.insert(buf, h, 3))
    assert(buf.toSeq == Seq(10L, 20L, 30L))
  }

  test("mergeSorted dedupes and caps") {
    val a = Array(1L, 3L, 5L)
    val b = Array(1L, 2L, 9L)
    assert(KmvSketch.mergeSorted(a, b, 4).toSeq == Seq(1L, 2L, 3L, 5L))
  }

  test("estimate is exact below k and within 20% above it") {
    assert(KmvSketch.estimate(Seq(5L, 9L), 64) == 2.0)
    // 2000 deterministic pseudo-uniform 48-bit hashes
    val rnd = new scala.util.Random(7)
    val hashes = Seq.fill(3000)(rnd.nextLong().abs % (1L << 48)).distinct
    val mins = hashes.sorted.take(64)
    val est = KmvSketch.estimate(mins, 64)
    assert(math.abs(est - hashes.size) / hashes.size < 0.2,
      s"estimate $est vs ${hashes.size}")
  }

  test("aggregator over a DataFrame: exact below k, close above") {
    val df = (1L to 40L).map(i => ("small", s"v$i"))
      .++((1L to 5000L).map(i => ("big", s"w$i")))
      .toDF("g", "v")
      .withColumn("h", TextFunctions.md5Hash48(col("v")))
      .repartition(8) // estimate must not depend on partitioning
    val out = df.groupBy("g")
      .agg(KmvSketch.kmvDistinct(col("h"), 64).as("est"))
      .as[(String, Double)].collect().toMap
    assert(out("small") == 40.0)
    assert(math.abs(out("big") - 5000.0) / 5000.0 < 0.25,
      s"big estimate ${out("big")}")
  }
}
