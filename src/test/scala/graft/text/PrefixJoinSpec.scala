package graft.text

import graft.SparkSpec

class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  private def bruteJaccard(docs: Seq[(Long, String)], tNum: Int,
      tDen: Int): Set[(Long, Long, Double)] = {
    val sets = docs.map { case (id, t) =>
      id -> t.trim.split("\\s+").filter(_.nonEmpty).map(_.toLowerCase).toSet
    }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size
      union = sa.size + sb.size - inter
      if inter.toLong * tDen >= tNum.toLong * union
    } yield (ia, ib, inter.toDouble / union)).toSet
  }

  test("hand-computed pairs and exact jaccard values") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma epsilon"), // J(1,2) = 3/5 = 0.6
      (3L, "alpha zeta eta theta"), //     J(1,3) = 1/7 — below
      (4L, "Alpha  beta GAMMA delta")) //  J(1,4) = 1.0 (case/space fold)
    val out = PrefixJoin
      .jaccardJoin(docs.toDF("doc_id", "text"), "doc_id", "text", 3, 5)
      .as[(Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 2L, 0.6), (1L, 4L, 1.0), (2L, 4L, 0.6)))
  }

  test("no recall loss: equals brute-force all-pairs on a random corpus") {
    val rnd = new scala.util.Random(61)
    val vocab = (1 to 40).map(i => s"w$i")
    val docs = (1L to 120L).map { i =>
      val n = 4 + rnd.nextInt(8)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    for ((tn, td) <- Seq((1, 2), (2, 3), (4, 5))) {
      val got = PrefixJoin
        .jaccardJoin(docs.toDF("doc_id", "text"), "doc_id", "text", tn, td)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == bruteJaccard(docs, tn, td), s"t=$tn/$td")
    }
  }

  test("boundary pairs exactly AT the threshold are kept") {
    // J = 1/2 exactly: sets {a,b,x}, {a,b,y} → inter 2, union 4
    val docs = Seq((1L, "a b x"), (2L, "a b y")).toDF("doc_id", "text")
    val at = PrefixJoin.jaccardJoin(docs, "doc_id", "text", 1, 2)
      .as[(Long, Long, Double)].collect().toSeq
    assert(at == Seq((1L, 2L, 0.5)))
    // and one notch above the same pair is excluded
    assert(PrefixJoin.jaccardJoin(docs, "doc_id", "text", 51, 100)
      .count() == 0)
  }

  test("empty docs and empty result sets are fine") {
    val docs = Seq((1L, "   "), (2L, "only one here"), (3L, "totally other"))
      .toDF("doc_id", "text")
    assert(PrefixJoin.jaccardJoin(docs, "doc_id", "text", 1, 2).count() == 0)
  }

  test("degenerate mass-duplicate corpus trips the loud bucket guard") {
    val docs = (1L to 100L).map(i => (i, "same four tokens here"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      PrefixJoin.jaccardJoin(docs, "doc_id", "text", 1, 2,
        maxBucket = 10).count()
    }
    assert(e.getMessage.contains("maxBucket"))
  }

  test("partition-independence") {
    val rnd = new scala.util.Random(67)
    val docs = (1L to 150L).map { i =>
      (i, Seq.fill(6)(s"t${rnd.nextInt(25)}").mkString(" "))
    }.toDF("doc_id", "text")
    val a = PrefixJoin.jaccardJoin(docs, "doc_id", "text", 1, 2)
      .as[(Long, Long, Double)].collect().toSet
    val b = PrefixJoin.jaccardJoin(docs.repartition(13), "doc_id", "text",
      1, 2).as[(Long, Long, Double)].collect().toSet
    assert(a == b)
  }

  test("bad thresholds are rejected") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      PrefixJoin.jaccardJoin(docs, "doc_id", "text", 0, 2)
    }
    intercept[IllegalArgumentException] {
      PrefixJoin.jaccardJoin(docs, "doc_id", "text", 3, 2)
    }
  }
}
