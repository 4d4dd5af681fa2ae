package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " * 8
  private val nearDup = base.replace("lazy", "sleepy") // one token differs
  private val unrelated =
    "completely different content about spark catalyst optimizer internals " * 8

  private def docs = Seq(
    (1L, base), (2L, base), // exact dups
    (3L, nearDup), // near dup of 1/2
    (4L, unrelated))
    .toDF("doc_id", "text")

  test("exactDupGroups: identical texts collapse to min id") {
    val g = TextDedup.exactDupGroups(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect()
    assert(g.length == 3) // base, nearDup, unrelated
    assert(g.exists { case (_, keep, n) => keep == 1L && n == 2L })
  }

  test("dedupExact keeps one row per distinct text") {
    val kept = TextDedup.dedupExact(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("nearDupPairs finds planted near-dups, not unrelated docs") {
    val pairs = TextDedup.nearDupPairs(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(ids.contains((1L, 2L))) // exact dup: jaccard 1.0
    assert(ids.contains((1L, 3L)) && ids.contains((2L, 3L))) // near dup
    assert(!ids.exists(p => p._1 == 4L || p._2 == 4L))
    assert(pairs.find(p => (p._1, p._2) == (1L, 2L)).get._3 == 1.0)
  }

  test("nearDupPairs plan contains no cartesian product (bucketed, not all-pairs)") {
    val plan = TextDedup.nearDupPairs(docs, "doc_id", "text")
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("cartesian"), plan)
  }

  test("simhash: near-dups land close in Hamming space, unrelated far") {
    val sh = TextDedup.simhashes(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(2L)) == 0)
    assert(hamming(sh(1L), sh(3L)) <= 12)
    assert(hamming(sh(1L), sh(4L)) > 12)
  }

  test("fingerprints: near-dups share fingerprints, unrelated share none") {
    val fp = TextDedup.fingerprints(docs, "doc_id", "text")
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    assert((fp(1L) & fp(3L)).nonEmpty)
    assert((fp(1L) & fp(4L)).isEmpty)
  }

  test("minhashBands emits bands × docs rows with stable keys") {
    val b = TextDedup.minhashBands(docs, "doc_id", "text")
    assert(b.count() == 4 * 16)
    // identical text ⇒ identical signature ⇒ identical band keys
    val k1 = b.filter($"doc_id" === 1L).select("band", "band_key")
      .as[(Long, String)].collect().toSet
    val k2 = b.filter($"doc_id" === 2L).select("band", "band_key")
      .as[(Long, String)].collect().toSet
    assert(k1 == k2)
  }

  test("wordShingles guard: short texts yield empty arrays, never errors") {
    val tiny = Seq((1L, "only two"), (2L, "")).toDF("doc_id", "text")
    val sh = tiny.select(TextFunctions.wordShingles($"text", 3).as("s"))
      .as[Seq[String]].collect()
    assert(sh.forall(_.isEmpty))
    assert(TextDedup.minhashBands(tiny, "doc_id", "text").count() == 0)
  }
}
