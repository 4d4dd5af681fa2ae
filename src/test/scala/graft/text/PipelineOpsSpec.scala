package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 pipeline operators: PII redaction, repetition signals,
  * contamination check, stratified mixture sampling. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii scrubs all three classes; counts read the original") {
    val df = Seq(
      (1L, "mail a.b+c@ex-corp.co.uk now"),
      (2L, "call 555-123-4567 or 555.987.6543"),
      (3L, "host 192.168.0.1 and 10.0.0.255"),
      (4L, "clean text with no pii at all"),
      // email host swallows its dots before the IP pass can see them
      (5L, "x@1.2.3.4.example.com then 1.2.3.4")).toDF("id", "t")
    val out = df.select($"id",
      Redact.countEmails($"t").as("e"), Redact.countPhones($"t").as("p"),
      Redact.countIpv4($"t").as("i"), Redact.redactPii($"t").as("r"))
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 1 && out(1L)._5 == "mail <EMAIL> now")
    assert(out(2L)._3 == 2 && out(2L)._5 == "call <PHONE> or <PHONE>")
    assert(out(3L)._4 == 2 && out(3L)._5 == "host <IP> and <IP>")
    assert(out(4L)._5 == "clean text with no pii at all")
    assert(out(5L)._5 == "x@1.2.3.4.example.com then 1.2.3.4"
      .replace("x@1.2.3.4.example.com", "<EMAIL>")
      .replace("1.2.3.4", "<IP>"))
    // redaction is a pure projection — no shuffle anywhere
    val plan = df.select(Redact.redactPii($"t"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("repetition signals: runs, top bigram, and edge cases") {
    val df = Seq(
      (1L, "a a a b b c"),     // run 3; top bigram "a a" ×2 of 5
      (2L, "x y x y x"),       // run 1; "x y" ×2 of 4
      (3L, "solo"),            // 1 token: no bigrams
      (4L, "t t t t t t t t")) // run 8; "t t" ×7 of 7
      .toDF("id", "t")
    val out = df.select($"id",
      Repetition.maxTokenRun($"t").as("run"),
      Repetition.topBigramCount($"t").as("top"),
      Repetition.topBigramFraction($"t").as("frac"))
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 2L, 0.4)))
    assert(out(2L) == ((2L, 1L, 2L, 0.5)))
    assert(out(3L) == ((3L, 1L, 0L, 0.0)))
    assert(out(4L) == ((4L, 8L, 7L, 1.0)))
  }

  test("contamination: exact overlap counts, benchmark excluded, broadcast") {
    // doc 10 is the benchmark; 20 shares two 3-grams with it ("a b c",
    // "b c d"), 21 shares one, 22 none; 23 repeats a shared 3-gram twice
    // but distinct-per-doc counting reports it once
    val df = Seq(
      (10L, "a b c d e"),
      (20L, "z a b c d"),
      (21L, "c d e q r"),
      (22L, "p q r s t"),
      (23L, "a b c x a b c")).toDF("id", "t")
    val out = Contamination
      .ngramOverlap(df, "id", "t", isBench = $"id" === 10L, k = 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(20L -> 2L, 21L -> 1L, 23L -> 1L), out)
    val plan = Contamination
      .ngramOverlap(df, "id", "t", isBench = $"id" === 10L, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("stratifiedCap: exact caps, deterministic, partition-independent") {
    val df = (1L to 300L).map(i => (i, s"src${i % 3}")).toDF("id", "src")
    val a = Sampling.stratifiedCap(df, "src", "id", cap = 7)
      .as[(Long, String, Long)].collect().toSet
    assert(a.size == 21 && a.groupBy(_._2).forall(_._2.size == 7))
    assert(a.forall(_._3 <= 7))
    val b = Sampling.stratifiedCap(df.repartition(17), "src", "id", cap = 7)
      .as[(Long, String, Long)].collect().toSet
    assert(a == b, "selection must not depend on partitioning")
    // growing a DIFFERENT stratum never changes this stratum's picks
    val grown = df.union((301L to 400L).map(i => (i, "src0")).toDF("id", "src"))
    val g = Sampling.stratifiedCap(grown, "src", "id", cap = 7)
      .as[(Long, String, Long)].collect().toSet
    assert(g.filter(_._2 != "src0") == a.filter(_._2 != "src0"))
  }

  test("tokenWindows: overlap, truncated tail, short/empty edges, no shuffle") {
    val df = Seq(
      (1L, (1 to 9).map(i => s"w$i").mkString(" ")), // 9 tokens
      (2L, "only three tokens"),                     // shorter than window
      (3L, "")                                       // one empty token
    ).toDF("id", "t")
    val out = Chunker.tokenWindows(df, "id", "t", window = 4, stride = 2)
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    // starts 0,2,4,6 (= ceil((9-4)/2)) — the last truncates to 3 tokens;
    // no window fully contained in its predecessor
    assert(out(1L).map(_._3) == Seq(
      "w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8", "w7 w8 w9"))
    assert(out(1L).map(_._4) == Seq(4L, 4L, 4L, 3L))
    assert(out(2L) == Seq((2L, 0L, "only three tokens", 3L)))
    assert(out(3L) == Seq((3L, 0L, "", 1L))) // split("") = [""], like Spark
    val plan = Chunker.tokenWindows(df, "id", "t", 4, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
