package graft.text

import graft.SparkSpec

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  // corpus: "a" x4, "b" x2, "c" x1, "d" x1 → total 8 tokens
  // bits(w) = floor(log2(8 DIV cnt)): a→1 (8/4=2), b→2 (8/2=4), c→3, d→3
  private val docs = Seq(
    (1L, "a a b c"), // tf: a2 b1 c1 → n=4, bits = 2*1 + 2 + 3 = 7
    (2L, "a b d"), //   n=3, bits = 1 + 2 + 3 = 6
    (3L, "a") //        n=1, bits = 1
  ).toDF("doc_id", "text")

  test("hand-computed surprisal: integer bits and exact means") {
    val out = LangModel.unigramSurprisal(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().toList.sortBy(_._1)
    assert(out == List(
      (1L, 4L, 7L, 1.75),
      (2L, 3L, 6L, 2.0),
      (3L, 1L, 1L, 1.0)))
  }

  test("case-folding merges tokens; empty/whitespace docs are absent") {
    val df = Seq((1L, "The THE the"), (2L, "   "), (3L, ""))
      .toDF("doc_id", "text")
    // single distinct token: total 3, cnt 3 → bits = floor(log2(1)) = 0
    val out = LangModel.unigramSurprisal(df, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().toList
    assert(out == List((1L, 3L, 0L, 0.0)))
  }

  test("rare tokens score high: ranking matches corpus frequency") {
    val common = (1 to 30).map(i => (i.toLong, "the quick brown fox"))
    val rare = Seq((100L, "zxqv jkwp mmtr vvbn"))
    val out = LangModel
      .unigramSurprisal((common ++ rare).toDF("doc_id", "text"),
        "doc_id", "text")
      .select("doc_id", "mean_bits").as[(Long, Double)].collect().toMap
    assert(out(100L) > out(1L))
    // every common doc scores identically (same token multiset)
    assert(common.map(c => out(c._1)).distinct.size == 1)
  }

  test("partition-independence: repartitioned corpus gives identical rows") {
    val big = (1 to 200)
      .map(i => (i.toLong, s"tok${i % 7} tok${i % 3} shared word$i"))
      .toDF("doc_id", "text")
    val a = LangModel.unigramSurprisal(big, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().toSet
    val b = LangModel
      .unigramSurprisal(big.repartition(7), "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(a == b && a.size == 200)
  }

  // ---- bigram ----

  test("bigram: hand-computed conditional bits with the context denominator") {
    // bigram counts: (a,b)=3, (b,a)=1, (b,c)=1; ctx: a→3, b→2
    // bits: (a,b) = log2(3 DIV 3)=0; (b,a) = log2(2)=1; (b,c) = 1
    val df = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = LangModel.bigramSurprisal(df, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().toList.sortBy(_._1)
    assert(out == List(
      (1L, 3L, 1L, 0.3333), // (a,b)x2 → 0 bits, (b,a) → 1 bit
      (2L, 2L, 1L, 0.5))) // doc 3 absent: no bigram evidence
  }

  test("bigram: adjacency survives extra whitespace and case folding") {
    val a = LangModel.bigramSurprisal(
      Seq((1L, "Foo   bar\tfoo")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().toList
    // cleaned sequence [foo, bar, foo] → 2 bigrams, each unique:
    // ctx(foo)=1 DIV 1 → 0 bits; ctx(bar)=1 DIV 1 → 0 bits
    assert(a == List((1L, 2L, 0L, 0.0)))
  }

  test("bigram: partition-independent") {
    val big = (1 to 120)
      .map(i => (i.toLong, s"tok${i % 5} tok${i % 3} tok${i % 2} end"))
      .toDF("doc_id", "text")
    val a = LangModel.bigramSurprisal(big, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().toSet
    val b = LangModel.bigramSurprisal(big.repartition(9), "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(a == b && a.size == 120)
  }
}
