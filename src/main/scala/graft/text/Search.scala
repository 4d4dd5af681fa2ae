package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus keyword search: inverted-index construction + BM25 top-k scoring
  * over the `documents` table — the retrieval primitive a training-data
  * pipeline uses for targeted corpus probes (benchmark leakage hunts,
  * topical subset extraction, quality spot-checks).
  *
  * Scale shape (the part that matters at 100 TB):
  *  - postings/df/doclen are ONE tokenize pass + hash aggregates over
  *    (doc, term) — linear, map-side partial, no all-pairs anything;
  *  - only postings matching the query terms survive past the first
  *    filter, so the scoring join touches |terms| × |matching docs| rows,
  *    not the corpus;
  *  - the per-term document frequencies are a |terms|-row table and are
  *    BROADCAST — the corpus-side rows never shuffle for that join;
  *  - top-k goes through `orderBy(...).limit(k)` which Spark executes as
  *    TakeOrderedAndProject: per-partition bounded heaps merged on the
  *    driver, NOT a global sort.
  *
  * Determinism (what makes an approximate-looking score oracle-exact):
  * classic BM25 idf is `ln((N - df + 0.5)/(df + 0.5))` — but `ln` is not
  * guaranteed correctly-rounded across engines/libm builds, so this
  * implementation uses the RATIONAL idf `(N - df + 0.5)/(df + 0.5)`
  * (same per-term monotonicity in df; the Robertson–Spärck Jones odds
  * ratio without the log). Every remaining operation is IEEE-754 +,-,×,÷
  * (each individually correctly rounded, fixed expression tree), the
  * per-term contribution is snapped to integer nano-units via
  * `floor(x·1e9 + 0.5)`, and the per-document sum runs over those LONGS —
  * exact and order-independent, so partitioning cannot perturb the score.
  * An external engine replaying the same expression tree reproduces every
  * score bit-for-bit.
  */
object Search {

  val K1 = 1.2
  val B = 0.75

  /** Lowercased whitespace tokens, exploded to one row per occurrence. */
  private def occurrences(docsDf: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docsDf.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .withColumn("w", lower(col("w")))

  /** BM25 (rational-idf) top-k: returns `(doc_id, n_terms, score)` for the
    * `k` best-scoring documents, ties broken by ascending doc id. */
  def bm25TopK(docsDf: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25TopK: empty query")
    val lowered = terms.map(_.toLowerCase)
    require(lowered.distinct == lowered,
      s"bm25TopK: query terms must be distinct (got $terms)")
    val occ = occurrences(docsDf, idCol, textCol)

    // one aggregate pass each — all map-side-combinable hash aggregates
    val doclen = occ.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val corpus = doclen.agg(
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"),
      count(lit(1)).cast("double").as("n"))
    val matching = occ.filter(col("w").isin(terms.map(_.toLowerCase): _*))
    val tf = matching.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dfreq = matching.groupBy("w")
      .agg(countDistinct(col("doc_id")).as("df"))

    // contribution — the EXACT expression tree the oracle replays:
    //   idf = (n - df + 0.5) / (df + 0.5)
    //   c   = idf * (tf * (k1+1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    // snapped to integer nano-units before the per-document sum.
    val idf = (col("n") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val num = col("tf").cast("double") * lit(K1 + 1.0)
    val den = col("tf").cast("double") +
      lit(K1) * (lit(1.0 - B) +
        lit(B) * col("dl").cast("double") / col("avgdl"))
    val contribNanos =
      floor(idf * num / den * lit(1e9) + lit(0.5)).cast("long")

    tf.join(broadcast(dfreq), "w") // |terms| rows — broadcast
      .join(doclen, "doc_id") // shuffle join on doc_id, both sides pre-agg'd
      .crossJoin(broadcast(corpus)) // 1 row
      .withColumn("c", contribNanos)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_terms"),
        (sum(col("c")).cast("double") / lit(1e9)).as("score"))
      .orderBy(col("score").desc, col("doc_id")) // TakeOrderedAndProject
      .limit(k)
  }

  // ---- persisted incremental index --------------------------------------

  private def postingsCfg = graft.storage.TableConfig("postings",
    Seq("w", "doc_id"), clusterByKey = true)
  private def doclenCfg = graft.storage.TableConfig("doclen", Seq("doc_id"),
    clusterByKey = true)

  /** Ingest a document batch into a PERSISTED inverted index (two lake
    * tables under `dir`): `postings(w, doc_id, tf)` keyed — and therefore
    * range-CLUSTERED — on the term, and `doclen(doc_id, dl)`. One tokenize
    * pass over the BATCH only; the already-indexed corpus is never
    * rescanned (the incremental-index discipline of q117/q139, applied to
    * keyword search). Because a document's rows are a pure function of its
    * text, re-delivering an identical batch upserts the same rows —
    * idempotent; replacing a CHANGED document requires deleting its old
    * postings first (same contract as any inverted index).
    *
    * At 100 TB the per-batch cost is O(batch tokens) + merge pruning on
    * the term-clustered postings table; a probe then touches O(terms)
    * files, not the corpus. */
  def indexBatch(spark: SparkSession, dir: String, batch: DataFrame,
      idCol: String, textCol: String): Unit = {
    import graft.storage.CowTable
    val occ = occurrences(batch, idCol, textCol)
    val tf = occ.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      .select("w", "doc_id", "tf")
    val dl = occ.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val post = CowTable(spark, dir + "/postings", postingsCfg)
    if (post.currentVersion == 0) post.create(tf) else post.upsert(tf)
    val dlt = CowTable(spark, dir + "/doclen", doclenCfg)
    if (dlt.currentVersion == 0) dlt.create(dl) else dlt.upsert(dl)
  }

  /** BM25 top-k answered FROM THE INDEX alone — the same contribution
    * expression tree as [[bm25TopK]] (bit-identical scores), but the only
    * data read is the probed terms' postings (leading-key range pruning on
    * the clustered postings table) plus the doclen side table. Because the
    * index state is a pure function of the ingested document set, a
    * two-batch build answers EXACTLY what the one-shot corpus scan
    * answers — [[bm25OracleSql]] is this probe's oracle verbatim. */
  def searchIndex(spark: SparkSession, dir: String, terms: Seq[String],
      k: Int): DataFrame = {
    import graft.storage.CowTable
    require(terms.nonEmpty, "searchIndex: empty query")
    val lowered = terms.map(_.toLowerCase)
    require(lowered.distinct == lowered,
      s"searchIndex: query terms must be distinct (got $terms)")
    val postAll = CowTable(spark, dir + "/postings", postingsCfg)
    val doclen = CowTable(spark, dir + "/doclen", doclenCfg).read()
    val corpus = doclen.agg(
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"),
      count(lit(1)).cast("double").as("n"))
    // term point-lookups ride the key-range prune: only files whose
    // [minKey, maxKey] can hold a probed term are opened
    val matching = lowered.map(t =>
        postAll.readRange(Some(t), Some(t)).filter(col("w") === t))
      .reduce(_ unionByName _)
    val dfreq = matching.groupBy("w").agg(count(lit(1)).as("df"))
    val idf = (col("n") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val num = col("tf").cast("double") * lit(K1 + 1.0)
    val den = col("tf").cast("double") +
      lit(K1) * (lit(1.0 - B) +
        lit(B) * col("dl").cast("double") / col("avgdl"))
    val contribNanos =
      floor(idf * num / den * lit(1e9) + lit(0.5)).cast("long")
    matching.join(broadcast(dfreq), "w")
      .join(doclen, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("c", contribNanos)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_terms"),
        (sum(col("c")).cast("double") / lit(1e9)).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Composable DuckDB CTE stack replaying [[bm25TopK]]'s scoring over
    * the `documents` table — ends in `bm25_scored(doc_id, n_terms,
    * score)`. Generated from the same constants so both engines inline
    * identical literals; exposed separately so downstream oracles (rank
    * fusion) can build on the scored set. */
  def bm25CteSql(terms: Seq[String]): String = {
    val termList = terms.map(t => s"'${t.toLowerCase}'").mkString(", ")
    raw"""occ AS (SELECT doc_id, lower(w) AS w FROM (
         |    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
         |    FROM documents) WHERE len(w) > 0),
         |doclen AS (SELECT doc_id, count(*) AS dl FROM occ GROUP BY doc_id),
         |corpus AS (SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
         |    CAST(count(*) AS DOUBLE) AS n FROM doclen),
         |tf AS (SELECT doc_id, w, count(*) AS tf FROM occ
         |  WHERE w IN ($termList) GROUP BY doc_id, w),
         |dfreq AS (SELECT w, count(DISTINCT doc_id) AS df FROM occ
         |  WHERE w IN ($termList) GROUP BY w),
         |contrib AS (SELECT tf.doc_id,
         |    CAST(floor(((n - CAST(df AS DOUBLE) + 0.5) /
         |        (CAST(df AS DOUBLE) + 0.5)) *
         |      (CAST(tf AS DOUBLE) * ${K1 + 1.0}) /
         |      (CAST(tf AS DOUBLE) + $K1 * (${1.0 - B} +
         |        $B * CAST(dl AS DOUBLE) / avgdl)) * 1e9 + 0.5) AS BIGINT)
         |      AS c
         |  FROM tf JOIN dfreq USING (w) JOIN doclen USING (doc_id)
         |  CROSS JOIN corpus),
         |bm25_scored AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
         |  CAST(sum(c) AS DOUBLE) / 1e9 AS score
         |FROM contrib GROUP BY doc_id)""".stripMargin
  }

  /** DuckDB oracle for [[bm25TopK]] over the `documents` table. */
  def bm25OracleSql(terms: Seq[String], k: Int): String =
    s"""WITH ${bm25CteSql(terms)}
       |SELECT doc_id, n_terms, score FROM bm25_scored
       |ORDER BY score DESC, doc_id LIMIT $k
       |""".stripMargin
}
