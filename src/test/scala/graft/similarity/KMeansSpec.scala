package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // two tight 2-dim clusters around (1,0) and (0,1); dim=2 for hand-math
  private def twoClusters = Seq(
    (1L, Seq(1.0f, 0.1f)), (2L, Seq(1.0f, -0.1f)), (3L, Seq(0.9f, 0.0f)),
    (4L, Seq(0.1f, 1.0f)), (5L, Seq(-0.1f, 1.0f)), (6L, Seq(0.0f, 0.9f)))
    .toDF("vec_id", "embedding")

  test("converges to the two cluster means, hand-computed") {
    val init = Seq(Seq(1000L, 0L), Seq(0L, 1000L))
    val out = KMeans.fit(twoClusters, "vec_id", "embedding", init,
      iters = 2, dim = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(t => (t._3, t._4, t._5))).toMap
    // cluster 0 members: qv (1000,100),(1000,-100),(900,0) → mean
    // (floor(2900/3+.5), floor(0/3+.5)) = (967, 0)
    assert(out(0L).map(_._1).toSeq == Seq(967L, 0L))
    assert(out(0L).forall(_._2 == 3L))
    // cluster 1 symmetric: (0, 967)
    assert(out(1L).map(_._1).toSeq == Seq(0L, 967L))
    // round-2 inertia vs the ROUND-1 centroids (967,0)/(0,967):
    // (1000,100): 33²+100² = 11089; (1000,-100): 11089; (900,0): 67² = 4489
    assert(out(0L).head._3 == 11089 + 11089 + 4489)
  }

  test("empty clusters carry their centroid with zero members") {
    val init = Seq(Seq(1000L, 0L), Seq(0L, 1000L), Seq(-5000L, -5000L))
    val out = KMeans.fit(twoClusters, "vec_id", "embedding", init,
      iters = 2, dim = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
    val dead = out.filter(_._1 == 2L).sortBy(_._2)
    assert(dead.map(_._3).toSeq == Seq(-5000L, -5000L))
    assert(dead.forall(r => r._4 == 0L && r._5 == 0L))
  }

  test("duplicate vectors each count as a member (no collapse)") {
    val df = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = KMeans.fit(df, "vec_id", "embedding",
      Seq(Seq(500L, 0L)), iters = 1, dim = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.forall(_._4 == 3L))
  }

  test("partition-independence: identical trajectory after repartition") {
    val rnd = new scala.util.Random(53)
    val big = (1L to 300L)
      .map(i => (i, Seq.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val init = Similarity.ivfCentroids(4, 8, seed = 3L)
    val a = KMeans.fit(big, "vec_id", "embedding", init, iters = 3, dim = 8)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val b = KMeans.fit(big.repartition(11), "vec_id", "embedding", init,
      iters = 3, dim = 8)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(a == b && a.size == 4 * 8)
  }

  test("inertia is non-increasing across rounds (Lloyd's invariant)") {
    val rnd = new scala.util.Random(59)
    val big = (1L to 400L)
      .map(i => (i, Seq.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val init = Similarity.ivfCentroids(4, 8, seed = 5L)
    def totalInertia(iters: Int): Long =
      KMeans.fit(big, "vec_id", "embedding", init, iters = iters, dim = 8)
        .filter($"pos" === 0).agg(sum("inertia")).head().getLong(0)
    val i1 = totalInertia(1)
    val i3 = totalInertia(3)
    assert(i3 <= i1, s"inertia rose: $i1 -> $i3")
  }

  test("bad init is rejected") {
    intercept[IllegalArgumentException] {
      KMeans.fit(twoClusters, "vec_id", "embedding",
        Seq(Seq(1L, 2L, 3L)), iters = 1, dim = 2)
    }
    intercept[IllegalArgumentException] {
      KMeans.fit(twoClusters, "vec_id", "embedding",
        Seq(Seq(1L, 2L)), iters = 0, dim = 2)
    }
  }
}
