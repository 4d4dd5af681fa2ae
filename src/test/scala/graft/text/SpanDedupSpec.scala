package graft.text

import graft.SparkSpec

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], k: Int = 3) =
    SpanDedup.dupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("a shared k-gram yields the covering span in both documents") {
    val out = spans(Seq(
      (1L, "x x a b c y y"), // "a b c" at positions 2..4
      (2L, "a b c z1 z2 z3 z4") // "a b c" at positions 0..2
    ))
    assert(out == Set((1L, 2L, 4L, 1L), (2L, 0L, 2L, 1L)), out)
  }

  test("adjacent duplicated shingles merge into one maximal span") {
    // "a b c d" shared → doc 1 has shingles (a b c)@1 and (b c d)@2:
    // consecutive positions, ONE span covering tokens 1..4
    val out = spans(Seq(
      (1L, "x a b c d y"),
      (2L, "a b c d")
    ))
    assert(out == Set((1L, 1L, 4L, 2L), (2L, 0L, 3L, 2L)), out)
  }

  test("disjoint duplicated regions stay separate spans") {
    val out = spans(Seq(
      (1L, "a b c q1 q2 q3 q4 d e f"), // spans 0..2 and 7..9
      (2L, "a b c z d e f")
    ))
    assert(out.filter(_._1 == 1L) ==
      Set((1L, 0L, 2L, 1L), (1L, 7L, 9L, 1L)), out)
  }

  test("intra-document repetition counts as duplication") {
    val out = spans(Seq((1L, "a b c z a b c")))
    // "a b c" occurs at 0 and 4 within the same doc
    assert(out == Set((1L, 0L, 2L, 1L), (1L, 4L, 6L, 1L)), out)
  }

  test("no repetition → empty; short docs produce no shingles") {
    assert(spans(Seq((1L, "a b c d e"), (2L, "f g h i j"))).isEmpty)
    assert(spans(Seq((1L, "a b"), (2L, "a b"))).isEmpty) // < k tokens
  }

  test("result is partition-independent") {
    val docs = (1L to 40L)
      .map(i => (i, if (i % 4 == 0) "p q r s t" else s"u$i v$i w$i x$i y$i"))
    val df = docs.toDF("doc_id", "text")
    def run(parts: Int) =
      SpanDedup.dupSpans(df.repartition(parts), "doc_id", "text", 3)
        .as[(Long, Long, Long, Long)].collect().toSet
    val a = run(1)
    assert(a == run(11))
    // every 4th doc is the same 5-token text → whole doc is one span
    assert(a == docs.filter(_._1 % 4 == 0)
      .map { case (i, _) => (i, 0L, 4L, 3L) }.toSet, a)
  }

  test("k < 2 is rejected") {
    intercept[IllegalArgumentException] {
      SpanDedup.dupSpans(Seq((1L, "a")).toDF("doc_id", "text"),
        "doc_id", "text", 1)
    }
  }
}
