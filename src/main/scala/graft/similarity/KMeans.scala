package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over the FULL corpus — the clustering
  * operator behind corpus bucketing / semantic dedup groups / IVF
  * quantizer refresh, complementing the two existing building blocks:
  * [[Similarity.trainIvfCentroids]] (driver-side over a bounded sample)
  * and q122's single M-step. This runs `iters` full assign+update rounds
  * over every vector, integer-exact end-to-end, so the whole TRAINING
  * TRAJECTORY — not just one step — is deterministic and replayable by an
  * external engine (the q140 oracle unrolls the same rounds as SQL CTEs).
  *
  * Determinism contract (same discipline as [[Similarity]]):
  *  - vectors quantized to integer thousandths; assignment is the exact
  *    int64 argmax of 2·(qv·c) − ‖c‖² (⇔ nearest-L2), ties → lowest cid;
  *  - centroid update re-quantizes the per-dim mean with the Parity floor
  *    form `floor(sum/n + 0.5)` — sums are exact int64 (< 2^53, so the
  *    one double division is correctly rounded identically everywhere);
  *  - empty clusters carry their previous centroid (no data-dependent
  *    reseed — replayability over repair; the IVF trainer reseeds);
  *  - per-cluster inertia Σ‖qv − c‖² is summed in exact int64.
  *
  * Scale shape (100 TB): each round is ONE pass — broadcast ≤k-row
  * centroid table, per-row argmax, then a (cid, pos) hash aggregate whose
  * map-side partial collapses every partition to ≤ k×dim rows BEFORE the
  * shuffle (the q122 shape). The driver only ever holds k×dim longs
  * between rounds; nothing else leaves the executors.
  */
object KMeans {

  /** `iters` Lloyd rounds from `init` (k quantized centroids). Returns
    * the final state, one row per (cluster, dimension):
    * (cid, pos, c, n_members, inertia) — `c` the UPDATED centroid
    * component, `n_members`/`inertia` from the final assignment (empty
    * clusters: carried `c`, zeros). */
  def fit(vectors: DataFrame, idCol: String, vecCol: String,
      init: Seq[Seq[Long]], iters: Int, dim: Int = 64): DataFrame = {
    require(init.nonEmpty && init.forall(_.size == dim),
      s"KMeans.fit: every initial centroid must be $dim-dim")
    require(iters >= 1, "KMeans.fit: need at least one round")
    val spark = vectors.sparkSession
    import spark.implicits._
    val k = init.size
    val n = vectors
      .select(col(idCol).as("__id"),
        Similarity.quantVec(col(vecCol)).as("__qv"))
      .withColumn("__n2", Similarity.dotQ(col("__qv"), col("__qv")))
      .filter(col("__n2") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cents: IndexedSeq[IndexedSeq[Long]] =
        init.map(_.toIndexedSeq).toIndexedSeq
      var out: DataFrame = null
      (1 to iters).foreach { _ =>
        val cdf = cents.zipWithIndex
          .map { case (c, i) => (i.toLong, c, c.map(x => x * x).sum) }
          .toDF("cid", "cv", "cn2")
        val assigned = n.crossJoin(broadcast(cdf))
          .withColumn("__s",
            lit(2L) * Similarity.dotQ(col("__qv"), col("cv")) - col("cn2"))
          .withColumn("__rn", row_number().over(
            Window.partitionBy(col("__id"))
              .orderBy(col("__s").desc, col("cid"))))
          .filter(col("__rn") === 1)
          .withColumn("__d2", col("__n2") - col("__s")) // ‖qv−c‖², exact
        val stats = assigned
          .select(col("cid"), col("__d2"),
            posexplode(col("__qv")).as(Seq("pos", "q")))
          .groupBy("cid", "pos")
          .agg(count(lit(1)).as("nm"), sum(col("q")).as("s"),
            sum(col("__d2")).as("inertia"))
          .collect() // ≤ k×dim rows — bounded by design
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
            r.getLong(3), r.getLong(4)))
        val byCid = stats.groupBy(_._1)
        val next = (0 until k).map { cid =>
          byCid.get(cid.toLong) match {
            case Some(rows) =>
              val byPos = rows.map(t => t._2 -> t).toMap
              IndexedSeq.tabulate(dim) { p =>
                val (_, _, nm, s, _) = byPos(p)
                math.floor(s.toDouble / nm + 0.5).toLong
              }
            case None => cents(cid) // empty cluster: carry
          }
        }
        out = (0 until k).flatMap { cid =>
          byCid.get(cid.toLong) match {
            case Some(rows) =>
              rows.sortBy(_._2).map { case (_, p, nm, _, in) =>
                (cid.toLong, p.toLong, next(cid)(p), nm, in)
              }
            case None =>
              (0 until dim).map(p =>
                (cid.toLong, p.toLong, next(cid)(p), 0L, 0L))
          }
        }.toDF("cid", "pos", "c", "n_members", "inertia")
        cents = next
      }
      out
    } finally n.unpersist(blocking = false)
  }

  /** DuckDB replay of [[fit]] over the `embeddings` table: the same
    * rounds unrolled as CTEs — assignment (argmax via row_number), per-
    * (cid,pos) stats, Parity-floor mean update with empty-cluster carry. */
  def fitSql(init: Seq[Seq[Long]], iters: Int): String = {
    val values = init.zipWithIndex.map { case (c, i) =>
      s"(${i}, ${c.mkString("[", ",", "]")}::BIGINT[])"
    }.mkString(", ")
    val rounds = (1 to iters).map { i =>
      s"""a$i AS (SELECT n.qv, n.n2, c.cid,
         |    n.n2 - (2*CAST(list_sum(list_transform(list_zip(n.qv, c.cv),
         |      z -> z[1]*z[2])) AS BIGINT) -
         |      CAST(list_sum(list_transform(c.cv, x -> x*x)) AS BIGINT)) AS d2,
         |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
         |      2*CAST(list_sum(list_transform(list_zip(n.qv, c.cv),
         |        z -> z[1]*z[2])) AS BIGINT) -
         |      CAST(list_sum(list_transform(c.cv, x -> x*x)) AS BIGINT) DESC,
         |      c.cid) AS rn
         |  FROM n CROSS JOIN c${i - 1} c),
         |s$i AS (SELECT cid, pos, count(*) AS nm,
         |    CAST(sum(q) AS BIGINT) AS s, CAST(sum(d2) AS BIGINT) AS inertia
         |  FROM (SELECT cid, d2, unnest(qv) AS q,
         |      generate_subscripts(qv, 1) - 1 AS pos FROM a$i WHERE rn = 1)
         |  GROUP BY cid, pos),
         |e$i AS (SELECT e.cid, e.pos,
         |    CASE WHEN s.nm IS NULL THEN e.c
         |      ELSE CAST(floor(CAST(s.s AS DOUBLE) / s.nm + 0.5) AS BIGINT)
         |    END AS c, coalesce(s.nm, 0) AS nm,
         |    coalesce(s.inertia, 0) AS inertia
         |  FROM e${i - 1} e LEFT JOIN s$i s
         |    ON s.cid = e.cid AND s.pos = e.pos),
         |c$i AS (SELECT cid, list(c ORDER BY pos) AS cv
         |  FROM e$i GROUP BY cid)""".stripMargin
    }.mkString(",\n")
    s"""WITH m AS (SELECT vec_id,
       |    list_transform(embedding, x ->
       |      CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS qv
       |  FROM embeddings),
       |n AS (SELECT vec_id, qv,
       |    CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS n2
       |  FROM m
       |  WHERE CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) > 0),
       |cinit AS (SELECT * FROM (VALUES $values) AS t(cid, cv)),
       |e0 AS (SELECT cid, unnest(cv) AS c,
       |    generate_subscripts(cv, 1) - 1 AS pos FROM cinit),
       |c0 AS (SELECT cid, cv FROM cinit),
       |$rounds
       |SELECT CAST(cid AS BIGINT) AS cid, CAST(pos AS BIGINT) AS pos, c,
       |  CAST(nm AS BIGINT) AS n_members, inertia
       |FROM e$iters
       |""".stripMargin
  }
}
