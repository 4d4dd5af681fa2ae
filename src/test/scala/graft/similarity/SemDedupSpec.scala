package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated 4-dim cluster centers (quantized thousandths)
  private val cents = Seq(
    Seq(1000L, 0L, 0L, 0L),
    Seq(0L, 1000L, 0L, 0L))

  private def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  test("keep-lowest-id within a cluster; cross-cluster twins survive") {
    val df = Seq(
      (1L, v(1.0, 0.0, 0.0, 0.0)),   // cluster 0, canonical
      (2L, v(0.99, 0.01, 0.0, 0.0)), // ~dup of 1 → dropped, witness 1
      (3L, v(0.98, 0.0, 0.01, 0.0)), // ~dup of 1 → dropped, witness 1
      (4L, v(0.0, 1.0, 0.0, 0.0)),   // cluster 1, canonical
      (5L, v(0.0, 0.99, 0.01, 0.0)), // ~dup of 4 → dropped, witness 4
      (6L, v(0.0, 0.1, 0.99, 0.0)))  // cluster 1 but dissimilar → kept
      .toDF("vec_id", "embedding")
    val got = SemDedup.flags(df, "vec_id", "embedding", cents, 9, 10)
      .orderBy("vec_id")
      .as[(Long, Long, Boolean, Option[Long])].collect().toSeq
    assert(got == Seq(
      (1L, 0L, false, None), (2L, 0L, true, Some(1L)),
      (3L, 0L, true, Some(1L)), (4L, 1L, false, None),
      (5L, 1L, true, Some(4L)), (6L, 1L, false, None)))
  }

  test("pairwise convention: a dropped doc can still be another's witness") {
    // 1 ~ 2 and 2 ~ 3 but 1 !~ 3 (chain): pairwise drops BOTH 2 (witness
    // 1) and 3 (witness 2) — the documented difference vs sequential
    // greedy, which would keep 3
    val a = v(1.0, 0.0, 0.0, 0.0)
    val b = v(0.924, 0.383, 0.0, 0.0) // cos(a,b) ≈ 0.924
    val c = v(0.707, 0.707, 0.0, 0.0) // cos(b,c) ≈ 0.924, cos(a,c) ≈ 0.707
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("vec_id", "embedding")
    val got = SemDedup.flags(df, "vec_id", "embedding",
      Seq(Seq(1000L, 0L, 0L, 0L)), 9, 10)
      .orderBy("vec_id")
      .as[(Long, Long, Boolean, Option[Long])].collect().toSeq
    assert(got == Seq((1L, 0L, false, None), (2L, 0L, true, Some(1L)),
      (3L, 0L, true, Some(2L))))
  }

  test("flags agree with a brute-force replay on a random-ish corpus") {
    val rnd = new scala.util.Random(7)
    val df = (1L to 120L).map { i =>
      // half the corpus are jittered copies of earlier vectors
      val base =
        if (i % 2 == 0) Seq.tabulate(4)(d => math.sin(i / 2 * 3 + d))
        else Seq.tabulate(4)(d => math.sin(i * 7 + d) + rnd.nextDouble() * 0.01)
      (i, base.map(_.toFloat))
    }.toDF("vec_id", "embedding")
    val got = SemDedup.flags(df, "vec_id", "embedding", cents, 19, 20)
      .as[(Long, Long, Boolean, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    // brute-force: quantize, assign, pairwise cosine in plain Scala
    def quant(xs: Seq[Float]): Seq[Long] =
      xs.map(x => math.floor(x.toDouble * 1000 + 0.5).toLong)
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val rows = df.as[(Long, Seq[Float])].collect()
      .map { case (id, e) => (id, quant(e)) }
      .filter { case (_, q) => dot(q, q) > 0 }
      .map { case (id, q) =>
        val cid = cents.zipWithIndex.map { case (c, i) =>
          (2L * dot(q, c) - dot(c, c), -i)
        }.zipWithIndex.maxBy(t => (t._1._1, t._1._2))._2
        (id, cid.toLong, q, dot(q, q))
      }
    rows.foreach { case (id, cid, q, n2) =>
      val sims = rows.filter { case (oid, ocid, oq, on2) =>
        oid < id && ocid == cid && {
          val d = dot(q, oq)
          d > 0 && BigInt(d) * BigInt(d) * 400 >= BigInt(361) * n2 * on2
        }
      }
      val (gid, gcid, gdropped, gwitness) = got(id)
      assert(gcid == cid, s"cluster mismatch for $id")
      assert(gdropped == sims.nonEmpty, s"drop mismatch for $id")
      assert(gwitness == sims.map(_._1).sorted.headOption,
        s"witness mismatch for $id")
    }
  }

  test("incremental: canon wins regardless of id, dropped seeds invisible") {
    def deg(d: Double) = v(math.cos(math.toRadians(d)),
      math.sin(math.toRadians(d)), 0.0, 0.0)
    // seed: 10 at 0° (canonical), 12 at 25° (≈10 at τ=0.9 → NOT in canon)
    val seed = Seq((10L, deg(0)), (12L, deg(25))).toDF("vec_id", "embedding")
    // batch: 3 at 1° (≈ canon 10 → dropped, witness 10 despite 3 < 10),
    //        5 at 2° (≈ canon 10 AND batch 3 → witness min(10,3) = 3),
    //        7 at 40° (≈ only the DROPPED seed 12 → KEPT: not in canon)
    val batch = Seq((3L, deg(1)), (5L, deg(2)), (7L, deg(40)))
      .toDF("vec_id", "embedding")
    val canon = SemDedup.indexOf(seed, "vec_id", "embedding", cents, 9, 10)
    assert(canon.select("vec_id").as[Long].collect().toSet == Set(10L))
    val got = SemDedup.incrementalFlags(canon, batch, "vec_id", "embedding",
      cents, 9, 10).orderBy("vec_id")
      .as[(Long, Long, Boolean, Option[Long])].collect().toSeq
    assert(got == Seq((3L, 0L, true, Some(10L)), (5L, 0L, true, Some(3L)),
      (7L, 0L, false, None)))
    // re-ingesting a canon row is idempotent: no self-witness
    val re = SemDedup.incrementalFlags(canon,
      Seq((10L, deg(0))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", cents, 9, 10)
      .as[(Long, Long, Boolean, Option[Long])].head()
    assert(re == ((10L, 0L, false, None)))
  }

  test("partition count does not change the verdicts") {
    val df = (1L to 60L).map(i =>
      (i, Seq.tabulate(4)(d => math.cos(i * 3 + d).toFloat)))
      .toDF("vec_id", "embedding")
    def run(parts: Int) =
      SemDedup.flags(df.repartition(parts), "vec_id", "embedding", cents,
        4, 5).as[(Long, Long, Boolean, Option[Long])].collect().toSet
    assert(run(1) == run(13))
  }

  test("degenerate cluster trips the loud guard before the self-join") {
    val df = (1L to 50L).map(i => (i, v(1.0, 0.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      SemDedup.flags(df, "vec_id", "embedding", cents, 9, 10,
        maxClusterSize = 10)
    }
    assert(e.getMessage.contains("maxClusterSize"))
  }
}
