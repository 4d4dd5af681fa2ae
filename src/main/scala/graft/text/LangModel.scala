package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-unigram language-model scoring — the CCNet-style "perplexity
  * against a reference LM" quality signal (Wenzek et al., LREC 2020)
  * re-expressed so the score is integer-exact and oracle-replayable.
  *
  * The reference LM here is the corpus itself: `p(w) = cnt(w) / total`.
  * Per-token surprisal is the INTEGER bit count
  * `floor(log2(total DIV cnt(w)))` — computed as
  * `length(bin(total DIV cnt)) - 1`, pure integer arithmetic end-to-end
  * (no transcendental `ln` whose last-ulp rounding differs across libm
  * builds; see [[Search]] for the same discipline applied to BM25 idf).
  * A document's score is the token-frequency-weighted sum of those bit
  * counts and its mean; high mean-bits = rare-token-heavy (OCR noise,
  * boilerplate hashes), low = common-token prose — the ranking signal a
  * perplexity filter thresholds on.
  *
  * Scale shape (100 TB corpus):
  *  - one tokenize pass → hash-aggregate to (doc, w, tf) and (w, cnt):
  *    both map-side-combinable, linear, never all-pairs;
  *  - the per-doc scoring join is (doc, w, tf) ⋈ (w, cnt) on `w` — the
  *    corpus text itself never shuffles, only the distinct-(doc,term)
  *    pairs; vocab is unbounded so this stays a shuffle join (AQE
  *    broadcasts it when the vocab is small);
  *  - the single-row total is a broadcast cross join.
  */
object LangModel {

  /** Lowercased whitespace token occurrences: (doc_id, w). */
  private def occurrences(docsDf: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docsDf.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .withColumn("w", lower(col("w")))

  /** Per-document unigram surprisal: (doc_id, n_tokens, total_bits,
    * mean_bits). Documents with no tokens are absent (no LM evidence).
    * `mean_bits` is Parity-rounded to 4 decimals for cross-engine hash
    * stability; `total_bits` and `n_tokens` are exact integers. */
  def unigramSurprisal(docsDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val occ = occurrences(docsDf, idCol, textCol)
    // the doc-term matrix is the pipeline's natural materialization point
    // (CCNet materializes exactly this): checkpointing it eagerly means
    // the corpus is tokenized ONCE — without it Catalyst re-derives the
    // tf subtree in all three consumer branches (scoring join, vocab
    // counts, grand total), i.e. three full corpus scans
    val tf = occ.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    // vocab counts and the grand total DERIVE from tf (cnt_w = Σ_doc tf):
    // they re-aggregate the compact (doc, term) frame, not the corpus
    val counts = tf.groupBy("w").agg(sum(col("tf")).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    // floor(log2(total DIV cnt)) as pure integer bit-length arithmetic
    val bits = (length(bin(expr("total DIV cnt"))) - 1).cast("long")
    tf.join(counts, "w") // shuffle join on w; corpus text never moves
      .crossJoin(broadcast(total)) // 1 row
      .withColumn("__bits", bits)
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("__bits")).as("total_bits"))
      .select(col("doc_id"), col("n_tokens"), col("total_bits"),
        graft.core.Parity.round4(col("total_bits").cast("double") /
          col("n_tokens").cast("double")).as("mean_bits"))
  }

  /** Lowercased, empty-filtered token ARRAY per doc (adjacency-preserving:
    * the filter runs on the array, not post-explode, so bigram neighbors
    * are the neighbors of the CLEANED sequence on both engines). */
  private def tokenArray(textCol: org.apache.spark.sql.Column) =
    filter(transform(TextFunctions.tokens(textCol), t => lower(t)),
      t => length(t) > 0)

  /** Per-document CONDITIONAL (bigram) surprisal — the next fidelity step
    * after [[unigramSurprisal]]: per-position bits are
    * `floor(log2(ctx(w1) DIV cnt(w1,w2)))` with `ctx(w1)` the count of
    * bigram occurrences STARTING with w1 (the correct conditional
    * denominator, not the unigram count). Same integer-exact bit-length
    * discipline; same scale shape (bigram pairs built columnar via
    * slice+zip — no positional self-join; corpus text never reshuffles;
    * only the compact (doc, w1, w2, tf) frame moves). Docs with < 2
    * tokens are absent (no bigram evidence). */
  def bigramSurprisal(docsDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val withT = docsDf
      .select(col(idCol).as("doc_id"), tokenArray(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
    val bi = withT.select(col("doc_id"),
      explode(arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1))).as("bg"))
      .select(col("doc_id"), col("bg.0").as("w1"), col("bg.1").as("w2"))
    val tf = bi.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // tokenize/zip once (three consumer branches)
    val counts = tf.groupBy("w1", "w2").agg(sum(col("tf")).as("cnt"))
    val ctx = counts.groupBy("w1").agg(sum(col("cnt")).as("ctx"))
    val bits = (length(bin(expr("ctx DIV cnt"))) - 1).cast("long")
    tf.join(counts, Seq("w1", "w2")).join(ctx, Seq("w1"))
      .withColumn("__bits", bits)
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(col("tf") * col("__bits")).as("total_bits"))
      .select(col("doc_id"), col("n_bigrams"), col("total_bits"),
        graft.core.Parity.round4(col("total_bits").cast("double") /
          col("n_bigrams").cast("double")).as("mean_bits"))
  }

  /** DuckDB replay of [[bigramSurprisal]]: same cleaned token list, pairs
    * via 1-based index unnest, same integer bit-length surprisal. */
  def bigramSurprisalSql: String =
    raw"""WITH lt AS (SELECT doc_id, list_filter(list_transform(
         |      string_split_regex(trim(text), '\s+'), x -> lower(x)),
         |      x -> len(x) > 0) AS toks FROM documents),
         |idx AS (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
         |        FROM lt WHERE len(toks) >= 2),
         |pairs AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2 FROM idx),
         |tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM pairs
         |       GROUP BY doc_id, w1, w2),
         |counts AS (SELECT w1, w2, count(*) AS cnt FROM pairs
         |           GROUP BY w1, w2),
         |ctx AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS ctx FROM counts
         |        GROUP BY w1),
         |b AS (SELECT doc_id, tf,
         |    CAST(length(format('{:b}', ctx // cnt)) - 1 AS BIGINT) AS bits
         |  FROM tf JOIN counts USING (w1, w2) JOIN ctx USING (w1))
         |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
         |  CAST(sum(tf * bits) AS BIGINT) AS total_bits,
         |  ${graft.core.Parity.round4Sql(
             "CAST(sum(tf * bits) AS DOUBLE) / CAST(sum(tf) AS DOUBLE)")}
         |    AS mean_bits
         |FROM b GROUP BY doc_id
         |""".stripMargin

  /** DuckDB replay of [[unigramSurprisal]] over the `documents` table —
    * identical tokenization (see [[Search.bm25CteSql]]) and the same
    * integer bit-length surprisal. */
  def unigramSurprisalSql: String =
    raw"""WITH occ AS (SELECT doc_id, lower(w) AS w FROM (
         |    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
         |    FROM documents) WHERE len(w) > 0),
         |tf AS (SELECT doc_id, w, count(*) AS tf FROM occ GROUP BY doc_id, w),
         |counts AS (SELECT w, count(*) AS cnt FROM occ GROUP BY w),
         |total AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts),
         |b AS (SELECT doc_id, tf,
         |    CAST(length(format('{:b}', total // cnt)) - 1 AS BIGINT) AS bits
         |  FROM tf JOIN counts USING (w) CROSS JOIN total)
         |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         |  CAST(sum(tf * bits) AS BIGINT) AS total_bits,
         |  ${graft.core.Parity.round4Sql(
             "CAST(sum(tf * bits) AS DOUBLE) / CAST(sum(tf) AS DOUBLE)")}
         |    AS mean_bits
         |FROM b GROUP BY doc_id
         |""".stripMargin
}
