package graft.queries

import graft.core.{Q, Tables}
import graft.similarity.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search + array-column handling over the `embeddings` table
  * (`embedding: array<float>`, 64-dim). The brute-force top-k is fully
  * oracle-checked — possible because scoring is integer-quantized (see
  * [[graft.similarity.Similarity]]); the LSH variant is the scale path and
  * gets a rows-only check plus a recall test in SimilaritySpec.
  */
object EmbeddingQueries {
  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.table(s, d, "embeddings")

  /** q134's keyword arm (declared before `all`, which captures it). */
  private val HybridTerms = Seq("join", "hash", "customer")

  /** DuckDB mirror of Similarity.quant. */
  private val qvSql =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT))"

  /** DuckDB mirror of Similarity.lshBucketQ over a column named `qv`
    * (same seeded plane-sign literals the operator embeds). */
  private def planeCasesSql(numPlanes: Int = 6): String =
    Similarity.planeSigns(numPlanes, 64).zipWithIndex.map {
      case (p, i) =>
        val arr = p.mkString("[", ",", "]")
        s"""(CASE WHEN CAST(list_sum(list_transform(
           |   list_zip(qv, $arr::BIGINT[]), z -> z[1]*z[2])) AS BIGINT) > 0
           | THEN ${1L << i} ELSE 0 END)""".stripMargin
    }.mkString(" + ")

  val all: Seq[Q] = Seq(

    // Brute-force exact cosine top-10 for every 50th vector as query.
    Q("q30_ann_topk",
      s"""WITH m AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |n AS (SELECT vec_id, qv,
         |        CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS n2
         |      FROM m WHERE CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) > 0),
         |q AS (SELECT * FROM n WHERE vec_id % 50 = 0),
         |p AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |        CAST(list_sum(list_transform(list_zip(q.qv, n.qv),
         |          z -> z[1]*z[2])) AS BIGINT) AS dot,
         |        q.n2 AS qn2, n.n2 AS cn2
         |      FROM q CROSS JOIN n WHERE q.vec_id <> n.vec_id)
         |SELECT query_id, neighbor_id, cosine, rank FROM (
         |  SELECT query_id, neighbor_id,
         |    CAST(dot AS DOUBLE) / sqrt(CAST(qn2 AS DOUBLE) * CAST(cn2 AS DOUBLE)) AS cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(qn2 AS DOUBLE) * CAST(cn2 AS DOUBLE)) DESC,
         |               neighbor_id) AS BIGINT) AS rank
         |  FROM p) WHERE rank <= 10
         |""".stripMargin) { (s, d) =>
      val e = emb(s, d)
      Similarity.cosineTopK(
        e, e.filter(col("vec_id") % 50 === 0), "vec_id", "embedding", 10)
    },

    // Array-column statistics: dims, sign counts, element access, exact
    // quantized L1 — the multimodal/array handling smoke surface.
    Q("q43_embed_stats",
      s"""SELECT vec_id, label,
         |  CAST(len(embedding) AS BIGINT) AS n_dims,
         |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
         |  CAST(embedding[1] AS DOUBLE) AS first_val,
         |  CAST(embedding[-1] AS DOUBLE) AS last_val,
         |  CAST(list_sum(list_transform($qvSql, x -> abs(x))) AS BIGINT) AS l1_quantized
         |FROM embeddings
         |""".stripMargin) { (s, d) =>
      emb(s, d).select(
        col("vec_id"), col("label"),
        size(col("embedding")).cast("long").as("n_dims"),
        size(filter(col("embedding"), x => x > 0)).cast("long").as("n_pos"),
        element_at(col("embedding"), 1).cast("double").as("first_val"),
        element_at(col("embedding"), -1).cast("double").as("last_val"),
        aggregate(Similarity.quantVec(col("embedding")), lit(0L),
          (acc, v) => acc + abs(v)).as("l1_quantized"))
    },

    // LSH-bucketed approximate top-k — the 100 TB path (candidates from the
    // query's bucket only). The integer-exact bucketing + quantized rescoring
    // make even this APPROXIMATE operator exactly reproducible, so the oracle
    // replays the identical buckets and ranking; recall vs the exact baseline
    // is additionally asserted in SimilaritySpec.
    Q("q44_ann_lsh",
      s"""WITH m AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |n AS (SELECT vec_id, qv,
         |        CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS n2
         |      FROM m WHERE CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) > 0),
         |bk AS (SELECT vec_id, qv, n2, ${planeCasesSql()} AS bucket FROM n),
         |q AS (SELECT * FROM bk WHERE vec_id % 50 = 0),
         |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |        CAST(list_sum(list_transform(list_zip(q.qv, c.qv),
         |          z -> z[1]*z[2])) AS BIGINT) AS dot,
         |        q.n2 AS qn2, c.n2 AS cn2
         |      FROM q JOIN bk c ON c.bucket = q.bucket
         |        AND c.vec_id <> q.vec_id)
         |SELECT query_id, neighbor_id, cosine, rank FROM (
         |  SELECT query_id, neighbor_id,
         |    CAST(dot AS DOUBLE) / sqrt(CAST(qn2 AS DOUBLE) * CAST(cn2 AS DOUBLE)) AS cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(qn2 AS DOUBLE) * CAST(cn2 AS DOUBLE)) DESC,
         |               neighbor_id) AS BIGINT) AS rank
         |  FROM p) WHERE rank <= 10
         |""".stripMargin) { (s, d) =>
      val e = emb(s, d)
      Similarity.annTopK(
        e, e.filter(col("vec_id") % 50 === 0), "vec_id", "embedding", 10)
    },

    // IVF approximate top-k: nearest-centroid lists (integer-exact
    // assignment over deterministic quantized centroids), nProbe=2 —
    // the oracle replays the identical list assignment and probing.
    Q("q55_ann_ivf", {
      val cents = Similarity.ivfCentroids(8, 64)
      val values = cents.zipWithIndex.map { case (c, i) =>
        s"(${i}, ${c.mkString("[", ",", "]")}::BIGINT[], ${c.map(x => x * x).sum})"
      }.mkString(", ")
      s"""WITH m AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |n AS (SELECT vec_id, qv,
         |        CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS n2
         |      FROM m WHERE CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) > 0),
         |cents AS (SELECT * FROM (VALUES $values) AS t(cid, cv, cn2)),
         |scored AS (SELECT n.vec_id, n.qv, n.n2, c.cid,
         |    2*CAST(list_sum(list_transform(list_zip(n.qv, c.cv),
         |      z -> z[1]*z[2])) AS BIGINT) - c.cn2 AS s
         |  FROM n CROSS JOIN cents c),
         |ranked AS (SELECT vec_id, qv, n2, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
         |  FROM scored),
         |corpus AS (SELECT vec_id, qv, n2, cid FROM ranked WHERE rn = 1),
         |probes AS (SELECT vec_id, qv, n2, cid FROM ranked
         |  WHERE rn <= 2 AND vec_id % 50 = 0),
         |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    CAST(list_sum(list_transform(list_zip(q.qv, c.qv),
         |      z -> z[1]*z[2])) AS BIGINT) AS dot, q.n2 AS qn2, c.n2 AS cn2
         |  FROM probes q JOIN corpus c ON c.cid = q.cid
         |    AND c.vec_id <> q.vec_id)
         |SELECT query_id, neighbor_id, cosine, rank FROM (
         |  SELECT query_id, neighbor_id,
         |    CAST(dot AS DOUBLE) / sqrt(CAST(qn2 AS DOUBLE) * CAST(cn2 AS DOUBLE)) AS cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(qn2 AS DOUBLE) * CAST(cn2 AS DOUBLE)) DESC,
         |               neighbor_id) AS BIGINT) AS rank
         |  FROM p) WHERE rank <= 10
         |""".stripMargin
    }) { (s, d) =>
      val e = emb(s, d)
      Similarity.ivfTopK(
        e, e.filter(col("vec_id") % 50 === 0), "vec_id", "embedding", 10)
    },

    // ANN RECALL@K — the index-quality evaluation an ANN deployment ships
    // with: per query, |IVF top-10 ∩ exact top-10| / |exact top-10|. Both
    // arms are the already-oracle-gated operators (q30 brute, q55 IVF), so
    // the metric is deterministic end to end and the oracle composes their
    // replays. The measurement you run BEFORE trusting nProbe/nLists at
    // corpus scale — and an output-bounded join: 10 rows per query on each
    // side regardless of corpus size.
    Q("q183_ann_recall", {
      val cents = Similarity.ivfCentroids(8, 64)
      val values = cents.zipWithIndex.map { case (c, i) =>
        s"(${i}, ${c.mkString("[", ",", "]")}::BIGINT[], ${c.map(x => x * x).sum})"
      }.mkString(", ")
      s"""WITH m AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |n AS (SELECT vec_id, qv,
         |        CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS n2
         |      FROM m WHERE CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) > 0),
         |eq AS (SELECT * FROM n WHERE vec_id % 50 = 0),
         |ep AS (SELECT eq.vec_id AS query_id, n.vec_id AS neighbor_id,
         |        CAST(list_sum(list_transform(list_zip(eq.qv, n.qv),
         |          z -> z[1]*z[2])) AS BIGINT) AS dot,
         |        eq.n2 AS qn2, n.n2 AS cn2
         |      FROM eq CROSS JOIN n WHERE eq.vec_id <> n.vec_id),
         |exact AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(qn2 AS DOUBLE) * CAST(cn2 AS DOUBLE)) DESC,
         |               neighbor_id) AS rank
         |  FROM ep) WHERE rank <= 10),
         |cents AS (SELECT * FROM (VALUES $values) AS t(cid, cv, cn2)),
         |scored AS (SELECT n.vec_id, n.qv, n.n2, c.cid,
         |    2*CAST(list_sum(list_transform(list_zip(n.qv, c.cv),
         |      z -> z[1]*z[2])) AS BIGINT) - c.cn2 AS s
         |  FROM n CROSS JOIN cents c),
         |ranked AS (SELECT vec_id, qv, n2, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
         |  FROM scored),
         |corpus AS (SELECT vec_id, qv, n2, cid FROM ranked WHERE rn = 1),
         |probes AS (SELECT vec_id, qv, n2, cid FROM ranked
         |  WHERE rn <= 2 AND vec_id % 50 = 0),
         |ip AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    CAST(list_sum(list_transform(list_zip(q.qv, c.qv),
         |      z -> z[1]*z[2])) AS BIGINT) AS dot, q.n2 AS qn2, c.n2 AS cn2
         |  FROM probes q JOIN corpus c ON c.cid = q.cid
         |    AND c.vec_id <> q.vec_id),
         |approx AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(qn2 AS DOUBLE) * CAST(cn2 AS DOUBLE)) DESC,
         |               neighbor_id) AS rank
         |  FROM ip) WHERE rank <= 10)
         |SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_hit,
         |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
         |FROM exact e LEFT JOIN approx a
         |  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
         |GROUP BY e.query_id
         |""".stripMargin
    }) { (s, d) =>
      val e = emb(s, d)
      val queries = e.filter(col("vec_id") % 50 === 0)
      val exact = Similarity
        .cosineTopK(e, queries, "vec_id", "embedding", 10)
        .select("query_id", "neighbor_id")
      val approx = Similarity
        .ivfTopK(e, queries, "vec_id", "embedding", 10)
        .select("query_id", "neighbor_id")
        .withColumn("hit", lit(1))
      exact
        .join(approx, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hit"))
        .select(col("query_id"), col("n_exact"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_exact").cast("double"))
            .as("recall"))
    },

    // Embedding-cosine near-dup pairs: quantized-LSH bucket candidates +
    // exact quantized rescoring. The bucket assignment itself is integer
    // arithmetic, so the oracle replays the IDENTICAL bucketing (plane sign
    // literals below are the same seeded sequence the operator embeds).
    Q("q49_embed_neardup", {
      val planeCases = planeCasesSql()
      s"""WITH m AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |n AS (SELECT vec_id, qv,
         |        CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS n2
         |      FROM m WHERE CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) > 0),
         |bk AS (SELECT vec_id, qv, n2, $planeCases AS bucket FROM n)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  CAST(list_sum(list_transform(list_zip(a.qv, b.qv),
         |    z -> z[1]*z[2])) AS DOUBLE) /
         |  sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)) AS cosine
         |FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE CAST(list_sum(list_transform(list_zip(a.qv, b.qv),
         |    z -> z[1]*z[2])) AS DOUBLE) /
         |  sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)) >= 0.4
         |""".stripMargin
    }) { (s, d) =>
      Similarity.embeddingNearDupPairs(emb(s, d), "vec_id", "embedding", 0.4)
    },

    // DISTRIBUTED CENTROID UPDATE (the M-step of distributed k-means, per
    // label): mean vector per group over the quantized space — integer sums
    // are exact and order-independent, so the result is deterministic and
    // oracle-replayable (unlike float accumulation). Plan shape at 100 TB:
    // posexplode multiplies rows by dim, but hash-aggregate's map-side
    // partial collapses each partition to (labels x dim) rows BEFORE the
    // shuffle — the corpus never shuffles raw vectors, only per-partition
    // partial sums (the complement of the driver-side bounded-sample
    // trainIvfCentroids: this path updates centroids from ALL rows).
    Q("q122_centroid_update",
      s"""WITH u AS (SELECT label, unnest($qvSql) AS q,
         |    generate_subscripts(embedding, 1) - 1 AS pos
         |  FROM embeddings)
         |SELECT label, CAST(pos AS BIGINT) AS pos,
         |  count(*) AS n_vectors,
         |  ${graft.core.Parity.round4Sql(
             "CAST(sum(q) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS mean_q
         |FROM u GROUP BY label, pos
         |""".stripMargin) { (s, d) =>
      emb(s, d)
        .select(col("label"),
          posexplode(Similarity.quantVec(col("embedding")))
            .as(Seq("pos", "q")))
        .groupBy("label", "pos")
        .agg(count(lit(1)).as("n_vectors"), sum(col("q")).as("__sum"))
        .select(col("label"), col("pos").cast("long").as("pos"),
          col("n_vectors"),
          graft.core.Parity.round4(col("__sum").cast("double") /
            col("n_vectors").cast("double")).as("mean_q"))
    },

    // HYBRID RETRIEVAL (RAG-style rank fusion): BM25 keyword ranks over
    // `documents` fused with exact-cosine vector ranks over `embeddings`
    // (query = vec_id 0, ids aligned with doc_ids) via Reciprocal Rank
    // Fusion, rrf = Σ 1/(60 + rank) — rank integers in, one division and
    // one addition out, so the fused score is bit-exact cross-engine.
    // Both arms are top-50; a doc missing from one arm contributes 0 from
    // it. Scale: each arm is the already-bounded retrieval operator
    // (broadcast df / TakeOrderedAndProject; quantized brute cosine), the
    // fusion join touches ≤100 rows.
    Q("q134_hybrid_retrieval",
      s"""WITH ${graft.text.Search.bm25CteSql(HybridTerms)},
         |tr AS (SELECT id, rank_t FROM (SELECT doc_id AS id,
         |    CAST(row_number() OVER (ORDER BY score DESC, doc_id)
         |      AS BIGINT) AS rank_t FROM bm25_scored) WHERE rank_t <= 50),
         |m AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |n AS (SELECT vec_id, qv,
         |    CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS n2
         |  FROM m WHERE CAST(list_sum(list_transform(qv, x -> x*x))
         |    AS BIGINT) > 0),
         |q0 AS (SELECT * FROM n WHERE vec_id = 0),
         |p AS (SELECT n.vec_id AS neighbor_id,
         |    CAST(list_sum(list_transform(list_zip(q0.qv, n.qv),
         |      z -> z[1]*z[2])) AS BIGINT) AS dot,
         |    q0.n2 AS qn2, n.n2 AS cn2
         |  FROM q0 CROSS JOIN n WHERE n.vec_id <> q0.vec_id),
         |vr AS (SELECT id, rank_v FROM (SELECT neighbor_id AS id,
         |    CAST(row_number() OVER (ORDER BY
         |      CAST(dot AS DOUBLE) / sqrt(CAST(qn2 AS DOUBLE) *
         |        CAST(cn2 AS DOUBLE)) DESC, neighbor_id)
         |      AS BIGINT) AS rank_v FROM p) WHERE rank_v <= 50),
         |f AS (SELECT coalesce(tr.id, vr.id) AS id, rank_t, rank_v,
         |    coalesce(1.0 / (60 + rank_t), 0.0) +
         |    coalesce(1.0 / (60 + rank_v), 0.0) AS rrf
         |  FROM tr FULL OUTER JOIN vr ON tr.id = vr.id)
         |SELECT id, rank_t, rank_v, rrf FROM f
         |ORDER BY rrf DESC, id LIMIT 20
         |""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docsDf = Tables.table(s, d, "documents")
      // rank window is global but over exactly the 50 surviving rows
      val tr = graft.text.Search
        .bm25TopK(docsDf, "doc_id", "text", HybridTerms, k = 50)
        .withColumn("rank_t", row_number()
          .over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast("long"))
        .select(col("doc_id").as("id"), col("rank_t"))
      val e = emb(s, d)
      val vr = Similarity
        .cosineTopK(e, e.filter(col("vec_id") === 0), "vec_id",
          "embedding", k = 50)
        .select(col("neighbor_id").as("id"), col("rank").as("rank_v"))
      tr.join(vr, Seq("id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(60) + col("rank_t")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("rank_v")), lit(0.0)))
        .orderBy(col("rrf").desc, col("id")).limit(20)
        .select("id", "rank_t", "rank_v", "rrf")
    },

    // INCREMENTAL ANN (corpus-growth shape, the embedding counterpart of
    // q117): the corpus's IVF index — (vec_id, cid, qv, n2), each vector in
    // its nearest-centroid list with the quantized vector materialized —
    // is PERSISTED as a lake table (appended per ingested batch; REUSED
    // here via a corpus content signature). Answering a query batch
    // centroid-assigns ONLY the batch (broadcast ≤nLists-row centroid
    // table) and joins its nProbe lists against the index: the 100 TB
    // embedding corpus is never rescanned — not for indexing the batch,
    // not for scoring. Oracle: q55's replayable IVF pipeline restricted to
    // corpus-side lists × batch-side probes.
    Q("q139_incremental_ann", {
      val cents = Similarity.ivfCentroids(8, 64)
      val values = cents.zipWithIndex.map { case (c, i) =>
        s"(${i}, ${c.mkString("[", ",", "]")}::BIGINT[], ${c.map(x => x * x).sum})"
      }.mkString(", ")
      s"""WITH m AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |n AS (SELECT vec_id, qv,
         |        CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS n2
         |      FROM m WHERE CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) > 0),
         |cents AS (SELECT * FROM (VALUES $values) AS t(cid, cv, cn2)),
         |scored AS (SELECT n.vec_id, n.qv, n.n2, c.cid,
         |    2*CAST(list_sum(list_transform(list_zip(n.qv, c.cv),
         |      z -> z[1]*z[2])) AS BIGINT) - c.cn2 AS s
         |  FROM n CROSS JOIN cents c),
         |ranked AS (SELECT vec_id, qv, n2, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
         |  FROM scored),
         |corpus AS (SELECT vec_id, qv, n2, cid FROM ranked
         |  WHERE rn = 1 AND vec_id % 3 <> 0),
         |probes AS (SELECT vec_id, qv, n2, cid FROM ranked
         |  WHERE rn <= 2 AND vec_id % 3 = 0),
         |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    CAST(list_sum(list_transform(list_zip(q.qv, c.qv),
         |      z -> z[1]*z[2])) AS BIGINT) AS dot, q.n2 AS qn2, c.n2 AS cn2
         |  FROM probes q JOIN corpus c ON c.cid = q.cid)
         |SELECT query_id, neighbor_id, cosine, rank FROM (
         |  SELECT query_id, neighbor_id,
         |    CAST(dot AS DOUBLE) / sqrt(CAST(qn2 AS DOUBLE) * CAST(cn2 AS DOUBLE)) AS cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(qn2 AS DOUBLE) * CAST(cn2 AS DOUBLE)) DESC,
         |               neighbor_id) AS BIGINT) AS rank
         |  FROM p) WHERE rank <= 10
         |""".stripMargin
    }) { (s, d) =>
      val e = emb(s, d)
      val corpus = e.filter(col("vec_id") % 3 =!= 0)
      val batch = e.filter(col("vec_id") % 3 === 0)
      // content signature: SOURCE DIR + vec_id-column-only membership
      // (count + order-free bit_xor of id hashes), same discipline as
      // q117 — the dir matters because distinct SF dirs can carry the
      // same ids with different vectors
      val sigRow = corpus
        .select(xxhash64(col("vec_id")).as("__h"))
        .agg(count(lit(1)).as("n"), expr("bit_xor(__h)").as("x"))
        .head()
      val contentSig = s"$d|${sigRow.getLong(0)}:${sigRow.get(1)}"
      val idxTbl = graft.storage.CowTable.replaceIfChanged(s,
        StorageQueries.tableDir("q139_annindex"),
        graft.storage.TableConfig("ann_index", Seq("vec_id")),
        contentSig,
        Similarity.ivfIndex(corpus, "vec_id", "embedding"))
      Similarity.ivfProbeIndex(
        idxTbl.read(), batch, "vec_id", "embedding", 10)
    },

    // DISTRIBUTED K-MEANS FIT (full Lloyd's, 3 rounds over the WHOLE
    // corpus — the iterative extension of q122's single M-step): integer-
    // exact assignment + Parity-floor mean re-quantization make the entire
    // training trajectory deterministic, so the oracle replays all three
    // rounds as unrolled CTEs and the final centroids, memberships and
    // per-cluster inertia match bit-for-bit. Scale: each round is one
    // broadcast-assign pass + a (cid,pos) hash agg collapsed map-side to
    // ≤ k×dim partials; only k×dim longs ever reach the driver.
    Q("q140_kmeans_fit",
      graft.similarity.KMeans.fitSql(Similarity.ivfCentroids(8, 64), 3)) {
      (s, d) =>
        graft.similarity.KMeans.fit(emb(s, d), "vec_id", "embedding",
          Similarity.ivfCentroids(8, 64), iters = 3)
    },

    // SEMANTIC DEDUP (SemDeDup, Abbas et al. '23): k-means clusters bound
    // the pairwise work, exact integer-quantized cosine inside each
    // cluster decides, keep-lowest-id picks survivors — the dedup layer
    // above MinHash/SimHash that catches paraphrases surface hashes
    // cannot. The rational-τ DECIMAL boundary test makes an
    // approximate-by-reputation operator hash-exact in the oracle.
    Q("q163_semantic_dedup",
      graft.similarity.SemDedup.flagsSql(
        Similarity.ivfCentroids(8, 64), 2, 5)) { (s, d) =>
      graft.similarity.SemDedup.flags(emb(s, d), "vec_id", "embedding",
        Similarity.ivfCentroids(8, 64), 2, 5)
    },

    // INCREMENTAL SEMANTIC DEDUP — the production ingest shape (the
    // persisted-canon counterpart of q117's signature store and q139's
    // IVF index): the even-id half dedups into a KEPT-canon lake table
    // (vec_id, cid, qv, n2 — reused across runs via content signature),
    // then the odd-id batch gets verdicts against (canon ∪ lower-id
    // batch members) WITHOUT rescanning the seed corpus. A batch row's
    // witness is the smallest matching id across both sources.
    Q("q168_incremental_semdedup",
      graft.similarity.SemDedup.incrementalFlagsSql(
        Similarity.ivfCentroids(8, 64), 2, 5,
        seedPred = "vec_id % 2 = 0", batchPred = "vec_id % 2 = 1")) {
      (s, d) =>
        val e = emb(s, d)
        val seed = e.filter(col("vec_id") % 2 === 0)
        val batch = e.filter(col("vec_id") % 2 === 1)
        val cents = Similarity.ivfCentroids(8, 64)
        // content signature: source dir + id membership (same discipline
        // as q117/q139 — distinct SF dirs can reuse ids)
        val sigRow = seed
          .select(xxhash64(col("vec_id")).as("__h"))
          .agg(count(lit(1)).as("n"), expr("bit_xor(__h)").as("x"))
          .head()
        val contentSig = s"$d|semdedup|${sigRow.getLong(0)}:${sigRow.get(1)}"
        val canonTbl = graft.storage.CowTable.replaceIfChanged(s,
          StorageQueries.tableDir("q168_semcanon"),
          graft.storage.TableConfig("sem_canon", Seq("vec_id")),
          contentSig,
          graft.similarity.SemDedup.indexOf(seed, "vec_id", "embedding",
            cents, 2, 5))
        graft.similarity.SemDedup.incrementalFlags(canonTbl.read(), batch,
          "vec_id", "embedding", cents, 2, 5)
    },

    // IVF-PQ ANN with refine (round 15 — the FAISS-standard memory-bound
    // shape, IndexIVFPQ + IndexRefine): the coarse quantizer prunes lists
    // exactly like q55/q183; the candidate PRE-RANK reads ONLY 8
    // product-quantization code ids per candidate (≈64× less state than
    // the 64 int64 lanes) via an integer ADC table; then just the top
    // refine·k ADC survivors per query are exact-rescored from raw
    // vectors. Every stage — coarse assignment, per-subspace encode
    // (argmax 2·(sub·c)−‖c‖², ties → lowest code), ADC sums,
    // reconstruction norms, both rank cuts — is deterministic, so the
    // oracle replays the approximate result ROW-EXACTLY (codebook +
    // centroid literals below are the identical seeded sequences the
    // operator embeds).
    Q("q209_ann_ivfpq", {
      val cents = Similarity.ivfCentroids(8, 64)
      val cvalues = cents.zipWithIndex.map { case (c, i) =>
        s"($i, ${c.mkString("[", ",", "]")}::BIGINT[], ${c.map(x => x * x).sum})"
      }.mkString(", ")
      val cb = Similarity.pqCodebooks(8, 16, 8)
      val cbValues = (for {
        (codes, j) <- cb.zipWithIndex
        (cv, c) <- codes.zipWithIndex
      } yield s"($j, $c, ${cv.mkString("[", ",", "]")}::BIGINT[], " +
        s"${cv.map(x => x * x).sum})").mkString(", ")
      s"""WITH m AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
         |n AS (SELECT vec_id, qv,
         |        CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS n2
         |      FROM m WHERE CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) > 0),
         |cents AS (SELECT * FROM (VALUES $cvalues) AS t(cid, cv, cn2)),
         |scoredc AS (SELECT n.vec_id, n.qv, n.n2, c.cid,
         |    2*CAST(list_sum(list_transform(list_zip(n.qv, c.cv),
         |      z -> z[1]*z[2])) AS BIGINT) - c.cn2 AS s
         |  FROM n CROSS JOIN cents c),
         |rankedc AS (SELECT vec_id, qv, n2, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rn
         |  FROM scoredc),
         |corpus AS (SELECT vec_id, qv, n2, cid FROM rankedc WHERE rn = 1),
         |probes AS (SELECT vec_id, qv, n2, cid FROM rankedc
         |  WHERE rn <= 2 AND vec_id % 50 = 0),
         |cb AS (SELECT * FROM (VALUES $cbValues) AS t(j, cc, cv, cn2)),
         |sub AS (SELECT c.vec_id, g.j,
         |    list_slice(c.qv, g.j*8+1, g.j*8+8) AS sv
         |  FROM corpus c CROSS JOIN generate_series(0, 7) AS g(j)),
         |enc AS (SELECT s.vec_id, s.j, b.cc, b.cn2,
         |    2*CAST(list_sum(list_transform(list_zip(s.sv, b.cv),
         |      z -> z[1]*z[2])) AS BIGINT) - b.cn2 AS s
         |  FROM sub s JOIN cb b ON b.j = s.j),
         |codes AS (SELECT vec_id, j, cc, cn2 FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id, j
         |    ORDER BY s DESC, cc) AS rn FROM enc) WHERE rn = 1),
         |lut AS (SELECT p.vec_id AS query_id, p.cid, p.n2 AS qn2, b.j, b.cc,
         |    CAST(list_sum(list_transform(list_zip(
         |      list_slice(p.qv, b.j*8+1, b.j*8+8), b.cv),
         |      z -> z[1]*z[2])) AS BIGINT) AS qd
         |  FROM probes p CROSS JOIN cb b),
         |pairs AS (SELECT l.query_id, c.vec_id AS neighbor_id, l.qn2,
         |    CAST(SUM(l.qd) AS BIGINT) AS adot,
         |    CAST(SUM(k.cn2) AS BIGINT) AS vn2
         |  FROM corpus c
         |  JOIN codes k ON k.vec_id = c.vec_id
         |  JOIN lut l ON l.cid = c.cid AND l.j = k.j AND l.cc = k.cc
         |  WHERE l.query_id <> c.vec_id
         |  GROUP BY l.query_id, c.vec_id, l.qn2),
         |adctop AS (SELECT query_id, neighbor_id
         |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY CAST(adot AS DOUBLE) /
         |        sqrt(CAST(qn2 AS DOUBLE) * CAST(vn2 AS DOUBLE)) DESC,
         |      neighbor_id) AS arank FROM pairs)
         |  WHERE arank <= 40),
         |refined AS (SELECT a.query_id, a.neighbor_id,
         |    CAST(list_sum(list_transform(list_zip(q.qv, c.qv),
         |      z -> z[1]*z[2])) AS DOUBLE) /
         |    sqrt(CAST(q.n2 AS DOUBLE) * CAST(c.n2 AS DOUBLE)) AS cosine
         |  FROM adctop a
         |  JOIN n c ON c.vec_id = a.neighbor_id
         |  JOIN n q ON q.vec_id = a.query_id)
         |SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
         |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id) AS rank FROM refined)
         |WHERE rank <= 10
         |""".stripMargin
    }) { (s, d) =>
      val e = emb(s, d)
      Similarity.ivfPqTopK(e, e.filter(col("vec_id") % 50 === 0),
        "vec_id", "embedding", 10)
    })
}
