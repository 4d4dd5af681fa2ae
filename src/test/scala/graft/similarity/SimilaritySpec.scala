package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosineTopK ranks parallel > oblique > orthogonal, excludes self") {
    val vecs = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(2f, 0f, 0f, 0f)),   // parallel to 1
      (3L, Seq(1f, 1f, 0f, 0f)),   // 45°
      (4L, Seq(0f, 0f, 1f, 0f)))   // orthogonal
      .toDF("vec_id", "embedding")
    val out = Similarity.cosineTopK(
      vecs, vecs.filter($"vec_id" === 1L), "vec_id", "embedding", 3)
      .orderBy("rank").as[(Long, Long, Double, Long)].collect()
    assert(out.map(_._2).toSeq == Seq(2L, 3L, 4L))
    assert(math.abs(out(0)._3 - 1.0) < 1e-9)
    assert(math.abs(out(1)._3 - math.sqrt(0.5)) < 1e-3) // quantized to 1e-3
    assert(math.abs(out(2)._3) < 1e-9)
    assert(!out.map(_._2).contains(1L))
  }

  test("quantized scoring is deterministic across repartitionings") {
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 60L)
      .map(i => (i, Seq.fill(16)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" <= 3)
    val a = Similarity.cosineTopK(vecs, q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Similarity.cosineTopK(vecs.repartition(13), q, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("annTopK: results are a subset of same-bucket candidates with decent recall") {
    val rnd = new scala.util.Random(11)
    // clustered corpus: 10 clusters × 30 points, queries are cluster members
    val centers = Seq.fill(10)(Seq.fill(16)(rnd.nextGaussian()))
    val vecs = (for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 30
    } yield (ci * 100L + j,
      c.zipWithIndex.map { case (x, _) => (x + rnd.nextGaussian() * 0.1).toFloat }))
      .toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" % 100 === 0)
    val exact = Similarity.cosineTopK(vecs, queries, "vec_id", "embedding", 10,
      ).as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Similarity.annTopK(vecs, queries, "vec_id", "embedding", 10,
      numPlanes = 4, dim = 16).as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.keys.toSeq.map { q =>
      val got = approx.getOrElse(q, Set.empty)
      (got & exact(q)).size.toDouble / exact(q).size
    }
    assert(recalls.sum / recalls.size >= 0.3,
      s"mean recall ${recalls.sum / recalls.size} too low")
    // approximate = candidates only from the query's bucket: strictly fewer
    // scored pairs than brute force (here just sanity: no query exceeds k)
    assert(approx.values.forall(_.size <= 10))
  }

  test("ivfTopK: one list per corpus row, decent recall on clustered data") {
    val rnd = new scala.util.Random(23)
    val centers = Seq.fill(6)(Seq.fill(16)(rnd.nextGaussian()))
    val vecs = (for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 25
    } yield (ci * 100L + j,
      c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat)))
      .toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" % 100 === 0)
    val exact = Similarity.cosineTopK(vecs, queries, "vec_id", "embedding", 5)
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Similarity.ivfTopK(vecs, queries, "vec_id", "embedding", 5,
      nLists = 4, nProbe = 2, dim = 16)
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // no duplicate (query, neighbor) rows and ranks within k
    assert(ivf.values.forall(_.size <= 5))
    val recalls = exact.keys.toSeq.map { q =>
      (ivf.getOrElse(q, Set.empty) & exact(q)).size.toDouble / exact(q).size
    }
    assert(recalls.sum / recalls.size >= 0.3,
      s"mean IVF recall ${recalls.sum / recalls.size} too low")
  }

  test("ivfPqTopK: code-only ADC ranking, decent recall on clustered " +
      "data, deterministic across repartitionings") {
    val rnd = new scala.util.Random(23)
    val centers = Seq.fill(6)(Seq.fill(64)(rnd.nextGaussian()))
    val vecs = (for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 25
    } yield (ci * 100L + j,
      c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat)))
      .toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" % 100 === 0)
    val exact = Similarity.cosineTopK(vecs, queries, "vec_id", "embedding", 5)
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pq = Similarity.ivfPqTopK(vecs, queries, "vec_id", "embedding", 5,
      nLists = 4, nProbe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(pq.values.forall(_.size <= 5))
    // clustered data: codes alone cannot separate cluster-mates (shared
    // quantization cell ⇒ tied ADC scores), but the refine rescore of the
    // refine·k ADC survivors restores most of the exact neighborhood
    val recalls = exact.keys.toSeq.map { q =>
      (pq.getOrElse(q, Set.empty) & exact(q)).size.toDouble / exact(q).size
    }
    assert(recalls.sum / recalls.size >= 0.5,
      s"mean IVF-PQ recall ${recalls.sum / recalls.size} too low")
    // deterministic integer ADC + tie-broken cuts ⇒ identical result
    // regardless of physical layout
    val again = Similarity.ivfPqTopK(vecs.repartition(7), queries,
      "vec_id", "embedding", 5, nLists = 4, nProbe = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val first = Similarity.ivfPqTopK(vecs, queries,
      "vec_id", "embedding", 5, nLists = 4, nProbe = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(again == first)
  }

  test("pq encode: differential vs brute-force nearest code, ties to " +
      "lowest id; pqIndex is per-row incremental") {
    val rnd = new scala.util.Random(5)
    val vecs = (0L until 60L).map(i =>
      (i, Seq.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebooks(8, 16, 8)
    val idx = Similarity.pqIndex(vecs, "vec_id", "embedding")
    val got = idx.select("vec_id", "codes", "vn2")
      .as[(Long, Seq[Int], Long)].collect()
      .map { case (k, c, n) => k -> (c, n) }.toMap
    // brute force over the SAME quantized integers
    val qvs = vecs.select(col("vec_id"),
      Similarity.quantVec(col("embedding")).as("qv"))
      .as[(Long, Seq[Long])].collect().toMap
    got.foreach { case (id, (codes, vn2)) =>
      val qv = qvs(id)
      val expected = (0 until 8).map { j =>
        val sub = qv.slice(j * 8, j * 8 + 8)
        val scores = cb(j).map(c =>
          2L * sub.zip(c).map { case (a, b) => a * b }.sum -
            c.map(x => x * x).sum)
        scores.indexOf(scores.max) // first max = lowest code id
      }
      assert(codes == expected, s"vec $id: engine codes $codes != $expected")
      assert(vn2 == expected.zipWithIndex.map { case (c, j) =>
        cb(j)(c).map(x => x * x).sum }.sum)
    }
    // per-row independence: index(a) ∪ index(b) ≡ index(a ∪ b)
    val (a, b) = (vecs.filter($"vec_id" < 30), vecs.filter($"vec_id" >= 30))
    val unioned = Similarity.pqIndex(a, "vec_id", "embedding")
      .unionByName(Similarity.pqIndex(b, "vec_id", "embedding"))
      .as[(Long, Long, Seq[Int], Long)].collect().toSet
    assert(unioned == idx.as[(Long, Long, Seq[Int], Long)].collect().toSet)
    // probing the persisted index reproduces the one-shot operator
    val queries = vecs.filter($"vec_id" % 20 === 0)
    val viaIndex = Similarity.pqProbeIndex(idx, vecs, queries,
      "vec_id", "embedding", 5)
      .as[(Long, Long, Double, Long)].collect().toSet
    val oneShot = Similarity.ivfPqTopK(vecs, queries,
      "vec_id", "embedding", 5)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(viaIndex == oneShot)
  }

  test("ivfProbeIndex over ivfIndex reproduces ivfTopK exactly") {
    val rnd = new scala.util.Random(41)
    val vecs = (1L to 120L)
      .map(i => (i, Seq.fill(16)((rnd.nextGaussian()).toFloat)))
      .toDF("vec_id", "embedding")
    val corpus = vecs.filter($"vec_id" % 3 =!= 0)
    val batch = vecs.filter($"vec_id" % 3 === 0)
    val direct = Similarity.ivfTopK(corpus, batch, "vec_id", "embedding", 5,
      nLists = 4, nProbe = 2, dim = 16)
      .as[(Long, Long, Double, Long)].collect().toSet
    val index = Similarity.ivfIndex(corpus, "vec_id", "embedding",
      nLists = 4, dim = 16)
    val viaIndex = Similarity.ivfProbeIndex(index, batch, "vec_id",
      "embedding", 5, nLists = 4, nProbe = 2, dim = 16)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(viaIndex == direct && direct.nonEmpty)
  }

  test("ivfIndex is per-row independent: index(corpus)∪index(batch) ≡ index(corpus∪batch)") {
    val rnd = new scala.util.Random(43)
    val all = (1L to 90L)
      .map(i => (i, Seq.fill(16)((rnd.nextGaussian()).toFloat)))
      .toDF("vec_id", "embedding")
    val part1 = all.filter($"vec_id" <= 60)
    val part2 = all.filter($"vec_id" > 60)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", $"cid", $"n2").as[(Long, Long, Long)]
        .collect().toSet
    val whole = rows(Similarity.ivfIndex(all, "vec_id", "embedding",
      nLists = 4, dim = 16))
    val incremental =
      rows(Similarity.ivfIndex(part1, "vec_id", "embedding",
        nLists = 4, dim = 16)) ++
        rows(Similarity.ivfIndex(part2, "vec_id", "embedding",
          nLists = 4, dim = 16))
    assert(incremental == whole && whole.size == 90)
  }

  test("trained centroids beat gaussian ones on skewed clustered embeddings") {
    // tight, far-apart clusters OFFSET from the origin — the shape real
    // embedding corpora have and data-independent gaussian centroids serve
    // worst (most rows collapse into few lists)
    val rnd = new scala.util.Random(31)
    val centers = Seq.tabulate(5)(ci =>
      Seq.fill(16)(rnd.nextGaussian() * 0.3 + (ci + 2.0)))
    val vecs = (for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 40
    } yield (ci * 100L + j,
      c.map(x => (x + rnd.nextGaussian() * 0.02).toFloat)))
      .toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" % 100 === 0)
    def recall(centroids: Option[Seq[Seq[Long]]]): Double = {
      val exact = Similarity.cosineTopK(vecs, queries, "vec_id", "embedding", 5)
        .as[(Long, Long, Double, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val ivf = Similarity.ivfTopK(vecs, queries, "vec_id", "embedding", 5,
        nLists = 5, nProbe = 1, dim = 16, centroids = centroids)
        .as[(Long, Long, Double, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = exact.keys.toSeq.map(q =>
        (ivf.getOrElse(q, Set.empty) & exact(q)).size.toDouble / exact(q).size)
      rs.sum / rs.size
    }
    val trained = Similarity.trainIvfCentroids(
      vecs, "embedding", nLists = 5, dim = 16)
    // determinism: retraining yields bit-identical centroids
    assert(trained == Similarity.trainIvfCentroids(
      vecs, "embedding", nLists = 5, dim = 16))
    val rTrained = recall(Some(trained))
    val rGauss = recall(None)
    // k-means puts one centroid per true cluster: single-probe recall is
    // near-perfect, while data-independent gaussians split/merge clusters
    assert(rTrained >= 0.9, s"trained recall $rTrained")
    assert(rTrained >= rGauss,
      s"trained $rTrained worse than gaussian $rGauss")
  }

  test("mismatched embedding dimensions fail loud, never mis-rank") {
    val vecs = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(1f, 0f)))           // corrupt: 2-dim in a 4-dim corpus
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.cosineTopK(
        vecs, vecs.filter($"vec_id" === 1L), "vec_id", "embedding", 3)
        .collect()
    }
    val msg = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => String.valueOf(m.getMessage)).mkString(" | ")
    assert(msg.contains("dimensions differ"), msg)

    val e2 = intercept[Exception] {
      Similarity.lshBuckets(
        Seq((1L, Seq.fill(8)(1.0f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", dim = 64).collect()
    }
    val msg2 = Iterator.iterate(e2: Throwable)(_.getCause)
      .takeWhile(_ != null).map(m => String.valueOf(m.getMessage))
      .mkString(" | ")
    assert(msg2.contains("64-dim"), msg2)
  }

  test("mass-duplicate embeddings trip the hot-bucket guard loudly") {
    // a degenerate corpus concentrates one LSH bucket; the within-bucket
    // self-join would go O(bucket²) on one reducer — the guard must fail
    // fast at call time, naming the bound, instead of OOM-ing mid-shuffle
    val vecs = (1L to 50L).map(i => (i, Seq(1f, 2f, 3f, 4f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.embeddingNearDupPairs(vecs, "vec_id", "embedding",
        threshold = 0.9, numPlanes = 4, dim = 4, maxBucket = 10)
    }
    assert(e.getMessage.contains("maxBucket"), e.getMessage)
    // with an adequate bound the same corpus still produces all pairs
    val ok = Similarity.embeddingNearDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.9, numPlanes = 4, dim = 4)
    assert(ok.count() == 50L * 49 / 2)
  }

  test("zero vectors are excluded (no NaN cosine)") {
    val vecs = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0f, 0f)), (3L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.cosineTopK(vecs, vecs, "vec_id", "embedding", 5)
      .as[(Long, Long, Double, Long)].collect()
    assert(!out.exists(r => r._1 == 2L || r._2 == 2L))
    assert(out.forall(r => !r._3.isNaN))
  }
}
