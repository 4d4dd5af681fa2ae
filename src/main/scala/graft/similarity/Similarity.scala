package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Scoring uses integer-quantized cosine: components are quantized to
  * thousandths with the Parity floor form (`floor(x·1000 + 0.5)` — identical
  * IEEE ops in any engine), dot products and norms are then EXACT int64
  * arithmetic (order-independent, no float-summation nondeterminism), and
  * the final cosine is one double division + sqrt. Quantization error is
  * ~1e-3 relative — irrelevant for neighbor ranking, decisive for
  * reproducibility: the same ranking on every engine, every partitioning.
  *
  * Shapes:
  *  - [[cosineTopK]]: brute-force Q×N scan — the exact baseline. The small
  *    query set is broadcast; no shuffle of the corpus.
  *  - [[lshBuckets]] / [[annTopK]]: random-hyperplane LSH — corpus hashed
  *    once into 2^planes buckets, candidates come from the query's bucket
  *    only (O(N/2^planes) per query), then exact-rescored. The scale path.
  */
object Similarity {

  /** floor(x·1000 + 0.5) as int64 — exact, portable quantization. */
  def quant(c: Column): Column =
    floor(c.cast("double") * 1000 + lit(0.5)).cast("long")

  def quantVec(v: Column): Column = transform(v, quant(_))

  /** Exact int64 dot product of two quantized vectors (native codegen'd
    * expression — the per-pair hot loop of the Q×N scan). */
  def dotQ(a: Column, b: Column): Column =
    graft.functions.HashArrayExpressions.dotLong(a, b)

  private def prepared(
      vectors: DataFrame, idCol: String, vecCol: String): DataFrame =
    graft.core.Spread.up(vectors)
      .select(col(idCol), quantVec(col(vecCol)).as("__qv"))
      .withColumn("__n2", dotQ(col("__qv"), col("__qv")))
      .filter(col("__n2") > 0) // zero vectors have no cosine direction

  /** Brute-force exact top-k cosine neighbors for each query vector.
    * Output: (query_id, neighbor_id, cosine, rank), rank 1..k per query with
    * deterministic ties (cosine desc, neighbor id asc). */
  def cosineTopK(
      vectors: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = prepared(vectors, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"),
        col("__qv").as("__cqv"), col("__n2").as("__cn2"))
    val q = prepared(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"),
        col("__qv").as("__qqv"), col("__n2").as("__qn2"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        dotQ(col("__qqv"), col("__cqv")).cast("double") /
          sqrt(col("__qn2").cast("double") * col("__cn2").cast("double")))
    scored
      .withColumn("rank",
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Deterministic ±1 random hyperplanes (seeded), embedded as literals —
    * public so an external oracle can replay the identical bucketing. */
  def planeSigns(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Long]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(if (rnd.nextBoolean()) 1L else -1L))
  }

  private def planes(numPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] =
    planeSigns(numPlanes, dim, seed).map(_.map(_.toDouble))

  /** Quantized-integer LSH bucket: bit i = (qv · plane_i > 0), with the dot
    * product in exact int64 — bucket assignment is therefore reproducible on
    * any engine (the double-dot variant in [[lshBuckets]] is Spark-internal
    * only). */
  def lshBucketQ(
      qv: Column, numPlanes: Int, dim: Int, seed: Long = 42L): Column =
    planeSigns(numPlanes, dim, seed).zipWithIndex.map { case (p, i) =>
      when(dotQ(qv, typedLit(p)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Deterministic data-independent IVF coarse centroids: seeded gaussians
    * quantized to integer thousandths — engine-reproducible, so an external
    * oracle can replay the exact list assignment. (A data-trained k-means
    * quantizer slots in here once centroids may be data-dependent.) */
  def ivfCentroids(
      nLists: Int, dim: Int, seed: Long = 7L): Seq[Seq[Long]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nLists)(Seq.fill(dim)(math.round(rnd.nextGaussian() * 1000)))
  }

  /** Data-trained IVF coarse centroids: Lloyd's k-means over a BOUNDED
    * deterministic sample of the corpus — the balanced-list path for real
    * (skewed, clustered) embeddings, where [[ivfCentroids]]'s
    * data-independent gaussians concentrate most rows in few lists and
    * probe cost degenerates toward a full scan.
    *
    * Scale shape: ONE distributed pass ranks rows by a content hash and
    * takes the lowest `maxSample` (deterministic — membership is a pure
    * function of vector content, not partitioning), then every Lloyd
    * iteration runs driver-side over ≤`maxSample` vectors: training cost is
    * independent of corpus size, and no per-iteration Spark job touches the
    * corpus. Centroids are quantized to the same integer-thousandths
    * contract as [[ivfCentroids]], so list assignment in [[ivfTopK]] stays
    * integer-exact and engine-reproducible given the trained centroids.
    * Empty clusters reseed to the farthest sample point (deterministic
    * tie-break), so all `nLists` lists stay live. */
  def trainIvfCentroids(
      vectors: DataFrame, vecCol: String, nLists: Int, dim: Int,
      iters: Int = 5, seed: Long = 7L, maxSample: Int = 4096): Seq[Seq[Long]] = {
    require(nLists > 0 && iters >= 0 && maxSample >= nLists,
      s"trainIvfCentroids: need maxSample >= nLists > 0 (got $nLists, $maxSample)")
    val sample: Array[Array[Long]] = vectors
      .select(quantVec(col(vecCol)).as("__qv"))
      .filter(size(col("__qv")) === dim)
      .withColumn("__h", xxhash64(col("__qv")))
      // secondary tie-break on the vector itself: on a hash collision at
      // the limit cutoff, membership must not depend on partition order
      // (same discipline as CowTable.stringRangeSplits)
      .orderBy(col("__h"), col("__qv")).limit(maxSample)
      .select(col("__qv")).collect()
      .map(_.getSeq[Long](0).toArray)
    require(sample.length >= nLists,
      s"trainIvfCentroids: corpus has only ${sample.length} usable " +
        s"$dim-dim vectors, need at least nLists=$nLists")
    def d2(a: Array[Long], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - c(i); s += d * d; i += 1 }
      s
    }
    // seeded init: nLists distinct sample points (hash order is already
    // content-shuffled, so a seeded index draw is an unbiased spread)
    val rnd = new scala.util.Random(seed)
    var cents: Array[Array[Double]] = rnd.shuffle(sample.indices.toVector)
      .take(nLists).map(i => sample(i).map(_.toDouble)).toArray
    (0 until iters).foreach { _ =>
      val sums = Array.fill(nLists)(new Array[Double](dim))
      val counts = new Array[Long](nLists)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < nLists) {
          val d = d2(v, cents(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      // live lists first; then reseed each dead list to the point farthest
      // from ALL centroids chosen SO FAR (including earlier reseeds), so
      // two lists dying in one iteration get DISTINCT new centroids —
      // duplicates would tie every assignment to the lower index and leave
      // the higher list dead forever
      val next = new Array[Array[Double]](nLists)
      cents.indices.foreach { c =>
        if (counts(c) > 0) next(c) = sums(c).map(_ / counts(c))
      }
      cents.indices.foreach { c =>
        if (counts(c) == 0) {
          val placed = next.filter(_ != null)
          next(c) = sample.maxBy(v => placed.map(d2(v, _)).min)
            .map(_.toDouble)
        }
      }
      cents = next
    }
    cents.map(_.map(math.round).toSeq).toSeq
  }

  /** IVF approximate top-k: corpus rows live in their nearest-centroid list
    * (argmax of 2·(qv·c) − ‖c‖², integer-exact ⇔ nearest in L2); each query
    * probes its `nProbe` nearest lists; candidates are exact-rescored with
    * the quantized cosine. O(N/nLists · nProbe) candidates per query.
    * `centroids` plugs in [[trainIvfCentroids]]' data-trained quantizer;
    * default stays the seeded-gaussian [[ivfCentroids]] (replayable by a
    * data-independent oracle). */
  def ivfTopK(
      vectors: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nLists: Int = 8, nProbe: Int = 2, dim: Int = 64,
      seed: Long = 7L, centroids: Option[Seq[Seq[Long]]] = None): DataFrame = {
    val cdf = centroidFrame(vectors.sparkSession,
      resolvedCentroids(centroids, nLists, dim, seed))
    val corpus = assignLists(
      prepared(vectors, idCol, vecCol).withColumnRenamed(idCol, "__id"),
      cdf, 1)
      .select(col("__id").as("neighbor_id"), col("cid"),
        col("__qv").as("__cqv"), col("__n2").as("__cn2"))
    val probes = assignLists(
      prepared(queries, idCol, vecCol).withColumnRenamed(idCol, "__id"),
      cdf, nProbe)
      .select(col("__id").as("query_id"), col("cid"),
        col("__qv").as("__qqv"), col("__n2").as("__qn2"))
    corpus.join(broadcast(probes), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        dotQ(col("__qqv"), col("__cqv")).cast("double") /
          sqrt(col("__qn2").cast("double") * col("__cn2").cast("double")))
      .withColumn("rank",
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
    // (each corpus row lives in exactly one list, so a pair joins at most
    // once even when the query probes several lists — no dedup needed)
  }

  private def resolvedCentroids(centroids: Option[Seq[Seq[Long]]],
      nLists: Int, dim: Int, seed: Long): Seq[Seq[Long]] = {
    centroids.foreach(cs => require(cs.nonEmpty && cs.forall(_.size == dim),
      s"ivf: every supplied centroid must be $dim-dim"))
    centroids.getOrElse(ivfCentroids(nLists, dim, seed))
  }

  private def centroidFrame(
      spark: org.apache.spark.sql.SparkSession,
      cents: Seq[Seq[Long]]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex
      .map { case (c, i) => (i.toLong, c, c.map(x => x * x).sum) }
      .toDF("cid", "cv", "cn2")
  }

  /** Nearest `keep` centroid lists per row of a [[prepared]] frame
    * (`__id`, `__qv`, `__n2`): one broadcast join against the ≤nLists-row
    * centroid table, argmax of 2·(qv·c) − ‖c‖² (integer-exact ⇔ L2). */
  private def assignLists(df: DataFrame, cdf: DataFrame,
      keep: Int): DataFrame =
    df.crossJoin(broadcast(cdf))
      .withColumn("__s",
        lit(2L) * dotQ(col("__qv"), col("cv")) - col("cn2"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__id")).orderBy(col("__s").desc, col("cid"))))
      .filter(col("__rn") <= keep)
      .select(col("__id"), col("cid"), col("__qv"), col("__n2"))

  /** IVF index rows for `vectors`: `(idCol, cid, qv, n2)` — each vector in
    * its single nearest-centroid list, with the quantized vector and its
    * squared norm MATERIALIZED so probes answer from the index alone.
    *
    * This is the persistable ANN state an incremental pipeline maintains:
    * indexing a new batch is one broadcast-centroid pass over the BATCH
    * (O(batch) — the already-indexed corpus is never touched, exactly the
    * shape of [[graft.text.TextDedup.incrementalNearDupPairs]]'s band
    * store), appended to the index lake table keyed on `idCol`. */
  def ivfIndex(
      vectors: DataFrame, idCol: String, vecCol: String,
      nLists: Int = 8, dim: Int = 64, seed: Long = 7L,
      centroids: Option[Seq[Seq[Long]]] = None): DataFrame = {
    val cdf = centroidFrame(vectors.sparkSession,
      resolvedCentroids(centroids, nLists, dim, seed))
    assignLists(
      prepared(vectors, idCol, vecCol).withColumnRenamed(idCol, "__id"),
      cdf, 1)
      .select(col("__id").as(idCol), col("cid"),
        col("__qv").as("qv"), col("__n2").as("n2"))
  }

  /** Approximate top-k over a PERSISTED [[ivfIndex]] table: queries are
    * centroid-assigned (nProbe lists, broadcast centroid table), then
    * joined to the index on `cid` and exact-rescored from the stored
    * (qv, n2) — the raw embedding corpus is never rescanned. The query
    * side is broadcast (bounded query batches); the index side only
    * filters + projects, so list pruning pushes down to the index scan
    * when the index table is clustered on `cid`. */
  def ivfProbeIndex(
      index: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nLists: Int = 8, nProbe: Int = 2, dim: Int = 64,
      seed: Long = 7L, centroids: Option[Seq[Seq[Long]]] = None): DataFrame = {
    val cdf = centroidFrame(index.sparkSession,
      resolvedCentroids(centroids, nLists, dim, seed))
    val corpus = index.select(col(idCol).as("neighbor_id"), col("cid"),
      col("qv").as("__cqv"), col("n2").as("__cn2"))
    val probes = assignLists(
      prepared(queries, idCol, vecCol).withColumnRenamed(idCol, "__id"),
      cdf, nProbe)
      .select(col("__id").as("query_id"), col("cid"),
        col("__qv").as("__qqv"), col("__n2").as("__qn2"))
    corpus.join(broadcast(probes), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        dotQ(col("__qqv"), col("__cqv")).cast("double") /
          sqrt(col("__qn2").cast("double") * col("__cn2").cast("double")))
      .withColumn("rank",
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Embedding-cosine near-duplicate pairs: candidates restricted to one
    * quantized-LSH bucket (never all-pairs), exact-rescored, thresholded.
    * Output (id_a, id_b, cosine) with id_a < id_b.
    *
    * `maxBucket` bounds any single LSH bucket (same loud guard as
    * TextDedup's banded minhash): a degenerate corpus — mass-duplicate
    * embeddings, near-zero vectors collapsing into one sign pattern — would
    * otherwise concentrate the self-join's O(bucket²) pair generation on a
    * single reducer. The guard fails fast naming the worst bucket instead of
    * OOM-ing mid-shuffle. */
  def embeddingNearDupPairs(
      vectors: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numPlanes: Int = 6, dim: Int = 64,
      seed: Long = 42L, maxBucket: Int = 1 << 20): DataFrame = {
    // persist across (guard action, pair action) so the quantize+bucket
    // pipeline runs once; the thresholded pair set is tiny, so it is
    // materialized eagerly while the cache is hot, then the cache dropped —
    // nothing leaks past this call
    val n = prepared(vectors, idCol, vecCol)
      .withColumn("bucket", lshBucketQ(col("__qv"), numPlanes, dim, seed))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val worst = n.groupBy(col("bucket"))
        .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucket)
        .orderBy(col("__n").desc).head(1)
      require(worst.isEmpty,
        s"embedding LSH bucket ${worst.headOption.fold("")(_.toString)} " +
          s"holds more than maxBucket=$maxBucket members — the within-bucket " +
          "self-join would explode quadratically on one reducer. Exact-dedup " +
          "the embeddings first, add planes, or raise maxBucket.")
      val a = n.select(col(idCol).as("id_a"), col("bucket"),
        col("__qv").as("__qa"), col("__n2").as("__na"))
      val b = n.select(col(idCol).as("id_b"), col("bucket"),
        col("__qv").as("__qb"), col("__n2").as("__nb"))
      a.join(b, Seq("bucket"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("cosine",
          dotQ(col("__qa"), col("__qb")).cast("double") /
            sqrt(col("__na").cast("double") * col("__nb").cast("double")))
        .filter(col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .localCheckpoint()
    } finally n.unpersist(blocking = false)
  }

  /** (id, bucket): sign pattern of the vector against `numPlanes` random
    * hyperplanes, packed into a long — one linear scan, no shuffle. */
  def lshBuckets(
      vectors: DataFrame, idCol: String, vecCol: String,
      numPlanes: Int = 6, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val ps = planes(numPlanes, dim, seed)
    val bucket = ps.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(
        zip_with(col(vecCol).cast("array<double>"), typedLit(p), (x, w) => x * w),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    // a dim mismatch would null-pad zip_with, null-poison every dot, and
    // silently drop ALL rows into bucket 0 — turning downstream candidate
    // generation into the all-pairs blowup this module exists to avoid
    val guarded = when(size(col(vecCol)) === dim, bucket)
      .otherwise(raise_error(concat(
        lit(s"lshBuckets: expected $dim-dim vectors, got "),
        size(col(vecCol)).cast("string"), lit("-dim row"))).cast("long"))
    vectors.select(col(idCol), guarded.as("bucket"))
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket,
    * exact-rescored with the same quantized cosine. Recall < 1 by design
    * (single-probe); raise recall with fewer planes or multi-probe.
    * Bucketing uses the integer-exact [[lshBucketQ]] (native codegen'd dot
    * product, engine-reproducible — an external oracle can replay it;
    * [[lshBuckets]] remains as the double-arithmetic HOF form). */
  def annTopK(
      vectors: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      numPlanes: Int = 6, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val c = prepared(vectors, idCol, vecCol)
      .withColumn("bucket", lshBucketQ(col("__qv"), numPlanes, dim, seed))
      .select(col(idCol).as("neighbor_id"), col("bucket"),
        col("__qv").as("__cqv"), col("__n2").as("__cn2"))
    val q = prepared(queries, idCol, vecCol)
      .withColumn("bucket", lshBucketQ(col("__qv"), numPlanes, dim, seed))
      .select(col(idCol).as("query_id"), col("bucket"),
        col("__qv").as("__qqv"), col("__n2").as("__qn2"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        dotQ(col("__qqv"), col("__cqv")).cast("double") /
          sqrt(col("__qn2").cast("double") * col("__cn2").cast("double")))
    scored
      .withColumn("rank",
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  // ------------------------------------------------------------------
  // PRODUCT QUANTIZATION (IVF-PQ — the FAISS-standard 100 TB ANN shape):
  // each vector is stored as m sub-space code ids instead of dim int64
  // lanes (m=8 codes for dim=64 ⇒ ~64× less candidate state), and
  // ranking reads ONLY the codes via an integer ADC (asymmetric distance
  // computation) table the query precomputes once. Codebooks are
  // deterministic seeded gaussians quantized to integer thousandths —
  // the same replayability contract as [[ivfCentroids]], so an external
  // SQL engine reproduces encode + ADC bit-exactly.
  // ------------------------------------------------------------------

  /** Deterministic data-independent PQ codebooks: `m` subspaces × `k`
    * codes of `subDim` integer-thousandth gaussians. */
  def pqCodebooks(m: Int = 8, k: Int = 16, subDim: Int = 8,
      seed: Long = 11L): Seq[Seq[Seq[Long]]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(m)(Seq.fill(k)(
      Seq.fill(subDim)(math.round(rnd.nextGaussian() * 1000))))
  }

  private def arrN2(v: Column): Column =
    aggregate(v, lit(0L), (a, x) => a + x * x)

  /** PQ-encode a quantized vector: array of `m` code ids, per subspace
    * the L2-nearest code (argmax 2·(sub·c) − ‖c‖², integer-exact; first
    * max ⇔ lowest code id — `array_position` keeps the tie rule). */
  private[similarity] def pqCodes(qv: Column, cb: Seq[Seq[Seq[Long]]]): Column = {
    val m = cb.size
    val subDim = cb.head.head.size
    val cbLit = typedLit(cb)
    transform(sequence(lit(0), lit(m - 1)), j => {
      val sub = slice(qv, j * subDim + 1, lit(subDim))
      val scores = transform(element_at(cbLit, (j + 1).cast("int")),
        cvec => lit(2L) * dotQ(sub, cvec) - arrN2(cvec))
      (array_position(scores, array_max(scores)) - 1).cast("int")
    })
  }

  /** The query's ADC lookup table: lut[j][c] = sub_j(query) · cb[j][c]
    * (m×k int64 cells, computed once per query, broadcast with it). */
  private def pqLut(qv: Column, cb: Seq[Seq[Seq[Long]]]): Column = {
    val m = cb.size
    val subDim = cb.head.head.size
    val cbLit = typedLit(cb)
    transform(sequence(lit(0), lit(m - 1)), j =>
      transform(element_at(cbLit, (j + 1).cast("int")),
        cvec => dotQ(slice(qv, j * subDim + 1, lit(subDim)), cvec)))
  }

  /** IVF-PQ approximate top-k with a REFINE stage (FAISS's
    * IndexIVFPQ + IndexRefine shape): the coarse quantizer prunes lists
    * (`nProbe` of `nLists`, same machinery as [[ivfTopK]]); candidates
    * are then PRE-RANKED without touching raw vectors — approx
    * dot(q,v) = Σ_j lut[j][code_j(v)] and reconstruction norm
    * ‖v̂‖² = Σ_j ‖cb[j][code_j]‖², exact int64 sums over the m stored
    * codes — and only the top `refine·k` ADC survivors per query have
    * their RAW vectors fetched for the exact final rescore. At 100 TB
    * this is the memory-bound regime's answer: the scan that does the
    * work reads ~m bytes per candidate (≈64× less than the raw lanes for
    * dim=64/m=8), and the exact read is a keyed fetch of refine·k rows
    * per query, not a corpus scan. PQ alone cannot separate vectors
    * inside one quantization cell (cluster-mates share codes — ties);
    * the refine pass restores that resolution. Every stage —
    * assignment, encode (argmax 2·(sub·c)−‖c‖², ties → lowest code),
    * ADC sums, both rank cuts (ties → neighbor_id) — is deterministic,
    * so an external engine replays the result row-exactly. Output:
    * (query_id, neighbor_id, cosine, rank), the [[ivfTopK]] contract. */
  def ivfPqTopK(
      vectors: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nLists: Int = 8, nProbe: Int = 2, dim: Int = 64,
      m: Int = 8, pqK: Int = 16, refine: Int = 4,
      seedIvf: Long = 7L, seedPq: Long = 11L): DataFrame =
    pqProbeIndex(
      pqIndex(vectors, idCol, vecCol, nLists, dim, m, pqK, seedIvf, seedPq),
      vectors, queries, idCol, vecCol, k, nLists, nProbe, dim, m, pqK,
      refine, seedIvf, seedPq)

  /** Σ_j lookup[j][codes[j]] as one codegen'd fold — the ADC hot loop
    * (also reused for the reconstruction norm with the ‖code‖² table). */
  private def codeFold(lookup: Column, codes: Column, m: Int): Column =
    aggregate(sequence(lit(0), lit(m - 1)), lit(0L), (acc, j) =>
      acc + element_at(element_at(lookup, (j + 1).cast("int")),
        (element_at(codes, (j + 1).cast("int")) + 1).cast("int")))

  /** Persistable IVF-PQ index rows: `(idCol, cid, codes, vn2)` — m code
    * ids + the reconstruction norm per vector, the code-only ANN state
    * the ADC pre-rank reads (~m small ints per vector vs dim int64
    * lanes). Encoding is per-row independent, so the index is
    * INCREMENTAL exactly like [[ivfIndex]]: indexing a new batch is one
    * broadcast centroid+codebook pass over the BATCH, and
    * index(corpus) ∪ index(batch) ≡ index(corpus ∪ batch). */
  def pqIndex(
      vectors: DataFrame, idCol: String, vecCol: String,
      nLists: Int = 8, dim: Int = 64, m: Int = 8, pqK: Int = 16,
      seedIvf: Long = 7L, seedPq: Long = 11L): DataFrame = {
    require(dim % m == 0, s"pq: dim $dim must split into $m subspaces")
    val cb = pqCodebooks(m, pqK, dim / m, seedPq)
    val cn2 = typedLit(cb.map(_.map(c => c.map(x => x * x).sum)))
    val cdf = centroidFrame(vectors.sparkSession,
      ivfCentroids(nLists, dim, seedIvf))
    assignLists(
      prepared(vectors, idCol, vecCol).withColumnRenamed(idCol, "__id"),
      cdf, 1)
      .select(col("__id").as(idCol), col("cid"),
        pqCodes(col("__qv"), cb).as("codes"))
      .withColumn("vn2", codeFold(cn2, col("codes"), m))
  }

  /** ADC pre-rank over a PERSISTED [[pqIndex]] + exact refine: queries
    * are centroid-assigned (`nProbe` lists), pre-ranked against the
    * index's CODES only (approx dot = Σ_j lut[j][code_j], norm from the
    * stored `vn2`), and the top `refine·k` survivors per query are
    * exact-rescored via a KEYED fetch from the raw corpus — the raw
    * vectors are never scanned, only the code rows are. */
  def pqProbeIndex(
      index: DataFrame, vectors: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nLists: Int = 8, nProbe: Int = 2, dim: Int = 64,
      m: Int = 8, pqK: Int = 16, refine: Int = 4,
      seedIvf: Long = 7L, seedPq: Long = 11L): DataFrame = {
    require(dim % m == 0, s"pq: dim $dim must split into $m subspaces")
    require(refine >= 1, "pq: refine factor must be >= 1")
    val cb = pqCodebooks(m, pqK, dim / m, seedPq)
    val cdf = centroidFrame(vectors.sparkSession,
      ivfCentroids(nLists, dim, seedIvf))
    val corpus = index.select(col(idCol).as("neighbor_id"), col("cid"),
      col("codes").as("__codes"), col("vn2").as("__vn2"))
    val queryPrepared = prepared(queries, idCol, vecCol)
      .withColumnRenamed(idCol, "__id")
    val probes = assignLists(queryPrepared, cdf, nProbe)
      .select(col("__id").as("query_id"), col("cid"),
        pqLut(col("__qv"), cb).as("__lut"), col("__n2").as("__qn2"))
    val adcTop = corpus.join(broadcast(probes), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("__adot", codeFold(col("__lut"), col("__codes"), m))
      .withColumn("__arank",
        row_number().over(Window.partitionBy("query_id")
          .orderBy((col("__adot").cast("double") /
            sqrt(col("__qn2").cast("double") * col("__vn2").cast("double")))
            .desc, col("neighbor_id"))))
      .filter(col("__arank") <= refine * k)
      .select("query_id", "neighbor_id")
    // REFINE: exact rescore of the refine·k ADC survivors only
    adcTop
      .join(prepared(vectors, idCol, vecCol)
        .select(col(idCol).as("neighbor_id"),
          col("__qv").as("__cqv"), col("__n2").as("__cn2")),
        Seq("neighbor_id"))
      .join(broadcast(queryPrepared.select(col("__id").as("query_id"),
        col("__qv").as("__qqv"), col("__n2").as("__qn2"))), Seq("query_id"))
      .withColumn("cosine",
        dotQ(col("__qqv"), col("__cqv")).cast("double") /
          sqrt(col("__qn2").cast("double") * col("__cn2").cast("double")))
      .withColumn("rank",
        row_number().over(Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
