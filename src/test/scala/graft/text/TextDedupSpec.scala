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

  test("hot-bucket guard: a mass-duplicate corpus fails loudly, not quadratically") {
    // 500 identical docs that SKIPPED exact dedup: every band bucket holds
    // all 500 ids — the pathological reducer-concentration case
    val adversarial = (1L to 500L).map(i => (i, base)).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextDedup.nearDupPairs(adversarial, "doc_id", "text", maxBucket = 100)
    }
    assert(e.getMessage.contains("maxBucket") &&
      e.getMessage.contains("dedupExact"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      TextDedup.simhashNearDupPairs(
        adversarial, "doc_id", "text", maxBucket = 100)
    }
    assert(e2.getMessage.contains("maxBucket"), e2.getMessage)
    // the same corpus passes once exact-deduped (the prescribed fix)
    val deduped = TextDedup.dedupExact(adversarial, "doc_id", "text")
    assert(TextDedup.nearDupPairs(deduped, "doc_id", "text",
      maxBucket = 100).count() == 0)
  }

  test("incrementalNearDupPairs: batch-vs-store pairs match the batch " +
    "operator's cross-split subset; corpus-side store is probe-only") {
    val all = docs.union(Seq((5L, base)).toDF("doc_id", "text"))
    val corpus = all.filter($"doc_id" <= 3)
    val batch = all.filter($"doc_id" > 3)
    val store = TextDedup.minhashBands(corpus, "doc_id", "text")
    val inc = TextDedup.incrementalNearDupPairs(
      store, corpus, batch, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    // full-batch operator over everything, restricted to corpus×batch
    val full = TextDedup.nearDupPairs(all, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => a <= 3 && b > 3 }.toSet
    assert(inc == full, s"inc=$inc full=$full")
    assert(inc.contains((1L, 5L, 1.0)) && inc.contains((2L, 5L, 1.0)))
    assert(!inc.exists { case (_, n, _) => n == 4L }) // unrelated stays out

    // hot store bucket: guarded loudly even though only probed buckets count
    val hotStore = TextDedup.minhashBands(
      (10L to 400L).map(i => (i, base)).toDF("doc_id", "text"),
      "doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextDedup.incrementalNearDupPairs(hotStore, corpus,
        Seq((900L, base)).toDF("doc_id", "text"), "doc_id", "text",
        maxBucket = 100)
    }
    assert(e.getMessage.contains("maxBucket"), e.getMessage)
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

  test("simhashNearDupPairs finds planted near-dups via bit-slice buckets") {
    val pairs = TextDedup.simhashNearDupPairs(docs, "doc_id", "text",
      maxHamming = 3)
      .as[(Long, Long, Long)].collect()
    val ids = pairs.map(p => (p._1, p._2)).toSet
    assert(ids.contains((1L, 2L))) // exact dups: hamming 0
    assert(pairs.find(p => (p._1, p._2) == (1L, 2L)).get._3 == 0L)
    assert(!ids.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated doc out
  }

  test("rollingFingerprints match a reference Rabin-Karp implementation") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val got = TextDedup.rollingFingerprints(df, "doc_id", "text",
      window = 8, stride = 4).select("fingerprint").as[Long].collect().toSet
    // independent reference implementation
    val bytes = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val M = 1000000007L
    val B = 131L
    def h(win: Array[Byte]): Long =
      win.foldLeft(0L)((acc, b) => (acc * B + (b & 0xff)) % M)
    val expected = (0 to bytes.length - 8 by 4)
      .map(i => h(bytes.slice(i, i + 8))).toSet
    assert(got == expected)
  }

  test("rollingFingerprints: docs sharing a long span share fingerprints") {
    val span = "a very long shared passage that exceeds the window size easily"
    val df = Seq(
      (1L, "prefix one " + span),
      (2L, "другой префикс " + span), // different byte offset + multibyte
      (3L, "nothing in common at all with those other documents here"))
      .toDF("doc_id", "text")
    val fp = TextDedup.rollingFingerprints(df, "doc_id", "text",
      window = 16, stride = 1)
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    assert((fp(1L) & fp(2L)).nonEmpty) // shared span detected at any offset
    assert((fp(1L) & fp(3L)).isEmpty)
  }

  test("wordShingles guard: short texts yield empty arrays, never errors") {
    val tiny = Seq((1L, "only two"), (2L, "")).toDF("doc_id", "text")
    val sh = tiny.select(TextFunctions.wordShingles($"text", 3).as("s"))
      .as[Seq[String]].collect()
    assert(sh.forall(_.isEmpty))
    assert(TextDedup.minhashBands(tiny, "doc_id", "text").count() == 0)
  }

  test("nearDupClusters: chains collapse to one component, min-id label") {
    // two components: {1,2,3,7} via chain 1-2, 2-3, 3-7; {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 7L), (10L, 11L))
      .toDF("id_a", "id_b")
    val out = TextDedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("nearDupClusters: empty pair set yields empty labels, no hang") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(TextDedup.nearDupClusters(pairs).count() == 0)
  }

  test("nearDupClusters: a 1000-link chain converges in O(log n) rounds") {
    // the crawl-dup-chain shape: diameter 1000. Min-label propagation
    // needs ~1000 rounds here; alternating large-star/small-star must
    // finish in ~log2(1000) ≈ 10.
    val pairs = (1L until 1000L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (out, rounds) = TextDedup.nearDupClustersWithRounds(pairs)
    assert(rounds <= 14, // ~log2(1000) + the no-change detection round
      s"expected O(log n) convergence, took $rounds rounds")
    val labels = out.as[(Long, Long)].collect()
    assert(labels.length == 1000)
    assert(labels.forall(_._2 == 1L),
      s"all 1000 chained nodes must share cluster 1, got " +
        s"${labels.filter(_._2 != 1L).take(5).toSeq}")
  }

  test("nearDupClusters: self-pairs and reversed duplicates are harmless") {
    val pairs = Seq((5L, 5L), (2L, 1L), (1L, 2L), (3L, 2L))
      .toDF("id_a", "id_b")
    val out = TextDedup.nearDupClusters(pairs).as[(Long, Long)]
      .collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L))
  }
}
