package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase global rank ≡ the single-partition window it replaces, is a
  * permutation, is reproducible, and is partitioning-invariant. */
class GlobalOrderSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1L to 1000L).map(i => (i, s"d$i")).toDF("id", "txt")

  test("rank equals the reference window rank and is a 0-based permutation") {
    val got = GlobalOrder.rank(corpus, "id", "s1", numPartitions = 7)
      .select($"id", $"ord").as[(Long, Long)].collect().toMap
    assert(got.values.toSeq.sorted == (0L until 1000L))
    val ref = corpus.withColumn("__k",
      md5(concat(lit("s1:"), $"id".cast("string"))))
      .withColumn("ord",
        row_number().over(Window.orderBy($"__k", $"id")) - 1)
      .select($"id", $"ord".cast("long")).as[(Long, Long)].collect().toMap
    assert(got == ref)
  }

  test("reproducible across runs and partition counts; seeds differ") {
    def run(seed: String, n: Int) =
      GlobalOrder.rank(corpus, "id", seed, n)
        .select($"id", $"ord").as[(Long, Long)].collect().toMap
    val a = run("epoch0", 3)
    assert(a == run("epoch0", 3))   // rerun: identical
    assert(a == run("epoch0", 13))  // partitioning-invariant
    val b = run("epoch1", 3)
    assert(a != b) // a new seed is a new permutation
    assert(b.values.toSeq.sorted == (0L until 1000L))
  }
}
