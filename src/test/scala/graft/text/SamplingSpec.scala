package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("split assignment is deterministic and partition-independent") {
    val df = (1L to 2000L).toDF("id")
    val a = Sampling.assignSplit(df, "id")
      .as[(Long, String)].collect().toMap
    val b = Sampling.assignSplit(df.repartition(13), "id")
      .as[(Long, String)].collect().toMap
    assert(a == b, "repartitioning must not reassign splits")
    // growing the corpus keeps prior assignments
    val grown = Sampling.assignSplit((1L to 4000L).toDF("id"), "id")
      .as[(Long, String)].collect().toMap
    assert(a.forall { case (k, v) => grown(k) == v })
  }

  test("ratios land near 80/10/10 and the plan is shuffle-free") {
    val df = (1L to 10000L).toDF("id")
    val out = Sampling.assignSplit(df, "id")
    val counts = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") - 8000L) < 400, counts)
    assert(math.abs(counts("val") - 1000L) < 200, counts)
    assert(math.abs(counts("test") - 1000L) < 200, counts)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("null ids fail loud instead of skewing the test split") {
    val df = Seq(Some(1L), None, Some(3L)).toDF("id")
    val e = intercept[Exception] {
      Sampling.assignSplit(df, "id").collect()
    }
    val msg = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => String.valueOf(m.getMessage)).mkString(" | ")
    assert(msg.contains("null"), msg)
  }

  test("bad percentages are rejected") {
    val df = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(df, "id", trainPct = 90, valPct = 20)
    }
  }

  test("rateSample: deterministic, partition-independent, rate-accurate, " +
    "shuffle-free; unmapped strata drop") {
    val df = (1L to 4000L).map(i => (i, s"src${i % 4}")).toDF("id", "src")
    val rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0)
    def ids(parts: Int): Seq[Long] =
      Sampling.rateSample(df.repartition(parts), "src", "id", rates)
        .select("id").as[Long].collect().sorted.toSeq
    val a = ids(1)
    assert(a == ids(13)) // membership is a pure function of the id
    val out = Sampling.rateSample(df, "src", "id", rates)
    val bySrc = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(bySrc("src0") == 1000L) // rate 1.0 keeps everything
    assert(!bySrc.contains("src2")) // rate 0.0 drops everything
    assert(!bySrc.contains("src3")) // unmapped stratum drops
    assert(math.abs(bySrc("src1") - 500L) < 100, bySrc) // ~rate 0.5
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("weightedPriority: matches the reference priority formula, " +
    "per-stratum k, partition-independent") {
    val rows = (1L to 600L).map(i => (i, s"s${i % 3}", (i % 7 + 1) * 10))
    val df = rows.toDF("id", "src", "w")
    def run(parts: Int) =
      Sampling.weightedPriority(df.repartition(parts), "src", "id", "w", 5)
        .select("id", "src", "wrn").as[(Long, String, Long)]
        .collect().toSet
    val got = run(1)
    assert(got == run(13)) // membership is a pure function of the ids
    assert(got.groupBy(_._2).forall(_._2.size == 5))
    // independent reference: priority = w * 2^48 / (md5-48(id) + 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h48(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(12)
      java.lang.Long.parseLong(hex, 16)
    }
    val want = rows.groupBy(_._2).flatMap { case (src, rs) =>
      rs.map { case (id, _, w) =>
        (id, w.toDouble * (1L << 48).toDouble / (h48(id).toDouble + 1.0)) }
        .sortBy { case (id, p) => (-p, id) }.take(5).zipWithIndex
        .map { case ((id, _), i) => (id, src, i + 1L) }
    }.toSet
    assert(got == want)
  }

  test("tokenBudgetCap: fill-until-full in md5 order, replayed brute-force") {
    import org.apache.spark.sql.functions.md5
    val df = (1L to 60L).map(i =>
      (i, s"s${i % 3}", 100L + (i * 37 % 400))).toDF("id", "src", "w")
    val got = Sampling.tokenBudgetCap(df, "src", "id", "w", 1000L)
      .select("id", "cum_weight").as[(Long, Long)].collect().toMap
    // brute-force replay: same md5-hex order, running sums per stratum
    val rows = df.withColumn("h", md5($"id".cast("string")))
      .select("id", "src", "w", "h")
      .as[(Long, String, Long, String)].collect()
    rows.groupBy(_._2).foreach { case (_, rs) =>
      var cum = 0L
      rs.sortBy(r => (r._4, r._1)).foreach { case (id, _, w, _) =>
        val before = cum
        cum += w
        if (before < 1000L)
          assert(got.get(id).contains(cum), s"id $id: expected kept @ $cum")
        else assert(!got.contains(id), s"id $id should be past the budget")
      }
    }
    // an oversized first doc still contributes (budgets are floors)
    val big = Seq((1L, "x", 99999L)).toDF("id", "src", "w")
    assert(Sampling.tokenBudgetCap(big, "src", "id", "w", 10L).count() == 1)
    // partition-independent
    val a = Sampling.tokenBudgetCap(df.repartition(7), "src", "id", "w",
      1000L).select("id").as[Long].collect().toSet
    assert(a == got.keySet)
  }

  test("temperatureMix: sqrt-law targets, deterministic prefix, flattening") {
    // skewed strata: a=400, b=100, c=25 → w = 20, 10, 5; Σw = 35
    val df = ((1L to 400L).map(i => (i, "a")) ++
      (401L to 500L).map(i => (i, "b")) ++
      (501L to 525L).map(i => (i, "c"))).toDF("id", "s")
    val out = Sampling.temperatureMix(df, "s", "id", 70L)
      .select($"s", $"id").as[(String, Long)].collect().toSeq
    val bySize = out.groupBy(_._1).view.mapValues(_.size).toMap
    // targets = 70*w div 35 = 40, 20, 10: raw 16:4:1 flattens to 4:2:1
    assert(bySize == Map("a" -> 40, "b" -> 20, "c" -> 10))
    // the kept set is the md5-order prefix (replay one stratum brute-force)
    val keptC = out.filter(_._1 == "c").map(_._2).toSet
    val expectC = (501L to 525L)
      .sortBy(i => (java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes).map("%02x".format(_)).mkString, i))
      .take(10).toSet
    assert(keptC == expectC)
    // partition-independent
    val again = Sampling.temperatureMix(df.repartition(7), "s", "id", 70L)
      .select($"s", $"id").as[(String, Long)].collect().toSeq
    assert(again.toSet == out.toSet)
    intercept[IllegalArgumentException](
      Sampling.temperatureMix(df, "s", "id", 0L))
  }

  test("weightedPriority: heavier rows win proportionally more often") {
    // two strata-free groups of ids with weights 1 vs 9 — the kept set
    // should skew hard toward the heavy rows
    val df = (1L to 2000L).map(i => (i, "all", if (i <= 1000) 1 else 9))
      .toDF("id", "src", "w")
    val kept = Sampling.weightedPriority(df, "src", "id", "w", 200)
      .select("id").as[Long].collect()
    val heavy = kept.count(_ > 1000L)
    assert(heavy > 140, s"heavy rows kept: $heavy of 200")
  }
}
