package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark merge engine merge merge fast"),
    (2L, "vector search over a vector index"),
    (3L, "stream stream stream stream"),
    (4L, "totally unrelated words only here"),
    (5L, "merge vector stream all three terms short")
  ).toDF("doc_id", "text")

  /** Independent reference BM25 (rational idf) computed in plain Scala. */
  private def referenceScores(
      docs: Seq[(Long, String)], terms: Seq[String]): Map[Long, Double] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.split("\\s+").toSeq.map(_.toLowerCase) }
    val n = toks.size.toDouble
    val avgdl = toks.map(_._2.size).sum.toDouble / toks.size
    val df = terms.map(t =>
      t -> toks.count(_._2.contains(t)).toDouble).toMap
    toks.flatMap { case (id, ws) =>
      val nanos = terms.flatMap { t =>
        val tf = ws.count(_ == t).toDouble
        if (tf == 0 || df(t) == 0) None
        else {
          val idf = (n - df(t) + 0.5) / (df(t) + 0.5)
          val c = idf * (tf * (Search.K1 + 1.0)) /
            (tf + Search.K1 * (1.0 - Search.B +
              Search.B * ws.size.toDouble / avgdl))
          Some(math.floor(c * 1e9 + 0.5).toLong)
        }
      }
      if (nanos.isEmpty) None else Some(id -> nanos.sum.toDouble / 1e9)
    }.toMap
  }

  test("bm25 scores match an independent reference implementation") {
    val terms = Seq("merge", "vector", "stream")
    val got = Search.bm25TopK(corpus, "doc_id", "text", terms, k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val want = referenceScores(
      corpus.as[(Long, String)].collect().toSeq, terms)
    assert(got == want, s"got $got want $want")
    // doc 4 matches no term and must be absent
    assert(!got.contains(4L))
    // doc 5 matches all three terms; verify n_terms plumbing
    val nTerms = Search.bm25TopK(corpus, "doc_id", "text", terms, 10)
      .select("doc_id", "n_terms").as[(Long, Long)].collect().toMap
    assert(nTerms(5L) == 3L && nTerms(3L) == 1L)
  }

  test("top-k truncates with deterministic doc_id tie-break") {
    // identical docs → identical scores; the k-boundary must cut by id
    val ties = (1L to 6L).map(i => (i, "alpha beta")).toDF("doc_id", "text")
    val kept = Search.bm25TopK(ties, "doc_id", "text", Seq("alpha"), k = 4)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L, 2L, 3L, 4L), kept)
  }

  test("scores are partition-independent (integer nano-unit sum)") {
    val terms = Seq("merge", "stream")
    def run(parts: Int) =
      Search.bm25TopK(corpus.repartition(parts), "doc_id", "text", terms, 10)
        .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(run(1) == run(7))
  }

  test("plan: broadcast df join + TakeOrderedAndProject top-k") {
    val plan = Search
      .bm25TopK(corpus, "doc_id", "text", Seq("merge", "vector"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("persisted index: batched build answers the one-shot scan exactly") {
    val dir = tmpDir("bmidx")
    val terms = Seq("merge", "vector", "stream")
    Search.indexBatch(spark, dir, corpus.filter($"doc_id" <= 2), "doc_id", "text")
    Search.indexBatch(spark, dir, corpus.filter($"doc_id" > 2), "doc_id", "text")
    val viaIndex = Search.searchIndex(spark, dir, terms, k = 10)
      .as[(Long, Long, Double)].collect().toSeq
    val oneShot = Search.bm25TopK(corpus, "doc_id", "text", terms, k = 10)
      .as[(Long, Long, Double)].collect().toSeq
    assert(viaIndex == oneShot) // order AND bit-exact scores
    // re-delivering a batch is idempotent (same doc → same rows upserted)
    Search.indexBatch(spark, dir, corpus.filter($"doc_id" <= 2), "doc_id", "text")
    assert(Search.searchIndex(spark, dir, terms, k = 10)
      .as[(Long, Long, Double)].collect().toSeq == oneShot)
  }

  test("persisted index: term probes prune postings files by key range") {
    val dir = tmpDir("bmidx")
    // many docs so the clustered postings table spans several files
    val big = (1L to 200L).map(i =>
      (i, s"w${i % 17} w${(i * 7) % 17} common filler")).toDF("doc_id", "text")
    // keep the tiny fixture multi-partition (AQE would coalesce to one
    // task, and a single range partition has no disjoint ranges to prune)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try Search.indexBatch(spark, dir, big.repartition(4), "doc_id", "text")
    finally spark.conf
      .unset("spark.sql.adaptive.coalescePartitions.enabled")
    val post = graft.storage.CowTable(spark, dir + "/postings",
      graft.storage.TableConfig("postings", Seq("w", "doc_id"),
        clusterByKey = true))
    val m = post.manifest(post.currentVersion)
    assert(m.files.size > 1, "fixture needs a multi-file postings table")
    val pruned = graft.storage.CowTable.filesInRange(m, Some("w3"), Some("w3"))
    assert(pruned.size < m.files.size,
      s"expected term-range pruning, kept ${pruned.size}/${m.files.size}; " +
        m.files.map(e => s"${e.path}[${e.minKey}..${e.maxKey}]")
          .mkString("\n"))
    // and the probe over the index is still exact
    val got = Search.searchIndex(spark, dir, Seq("w3"), k = 5)
      .select("doc_id").as[Long].collect().toSet
    val ref = Search.bm25TopK(big, "doc_id", "text", Seq("w3"), k = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(got == ref)
  }

  test("empty and duplicate queries are rejected") {
    intercept[IllegalArgumentException] {
      Search.bm25TopK(corpus, "doc_id", "text", Nil, 5)
    }
    intercept[IllegalArgumentException] {
      Search.bm25TopK(corpus, "doc_id", "text", Seq("a", "A"), 5)
    }
  }
}
