package graft.queries

import graft.core.{Q, Tables}
import graft.text.{Chunker, Contamination, Redact, Repetition, Sampling, TextDedup, TextFunctions, TextStats}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-data-pipeline text operators over the `documents` table: exact and
  * near (MinHash-LSH) dedup, SimHash, winnowing fingerprints, token/quality
  * statistics, language ID. Every query pairs the Spark-first operator with a
  * DuckDB oracle replaying the identical algorithm in SQL — possible because
  * all hashing is md5-derived ([[TextFunctions.md5Hash48]]) and all
  * arithmetic is engine-portable (affine minhash mod 2^31-1, exact
  * power-of-two bit math).
  */
object TextQueries {
  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.table(s, d, "documents")

  // ---- shared DuckDB oracle fragments (mirror TextFunctions exactly) ------

  /** whitespace tokens of `text` */
  private val toksSql = raw"string_split_regex(trim(text), '\s+')"
  /** q121's source mixture (declared once — and BEFORE `all`, which
    * captures it at object init — so the Spark filter and the oracle CASE
    * inline the identical thresholds). */
  private val MixRates = Seq(
    "src0" -> 0.9, "src1" -> 0.7, "src2" -> 0.5, "src3" -> 0.3,
    "src4" -> 0.1)

  /** q127's query terms (declared before `all`, which captures them). */
  private val BmQueryTerms = Seq("vector", "merge", "stream")

  private def hash48Sql(x: String) =
    s"('0x' || substr(md5($x), 1, 12))::BIGINT"

  /** Stopword list literals (mirror TextStats.stopwords) — single source
    * for every oracle that scores or classifies by stopwords. */
  private val stopEn = "'the','a','of','and','to'"
  private val stopEs = "'el','la','de','los','que'"
  private val stopFr = "'le','les','des','et','une'"
  private val stopDe = "'der','die','das','und','ist'"

  /** Language argmax CASE over four count expressions (ties resolve
    * en > es > fr > de, mirroring TextStats.languageId). */
  private def langPredCaseSql(
      cEn: String, cEs: String, cFr: String, cDe: String): String =
    s"""CASE WHEN $cEn >= $cEs AND $cEn >= $cFr AND $cEn >= $cDe THEN 'en'
       |     WHEN $cEs >= $cFr AND $cEs >= $cDe THEN 'es'
       |     WHEN $cFr >= $cDe THEN 'fr' ELSE 'de' END""".stripMargin

  /** Quality blend over a `documents` row (mirror TextStats.qualityScore). */
  private val qualityScoreSql =
    s"""floor((least(CAST(len($toksSql) AS DOUBLE) / 100.0, 1.0) * 0.5 +
       |       least(CAST(len(list_distinct($toksSql)) AS DOUBLE) /
       |             CAST(len($toksSql) AS DOUBLE), 1.0) * 0.3 +
       |       least(CAST(len(list_filter(list_transform($toksSql,
       |               x -> lower(x)), x -> x IN ($stopEn)))
       |             AS DOUBLE) /
       |             CAST(len($toksSql) AS DOUBLE) * 5.0, 1.0) * 0.2)
       |      * 10000 + 0.5) / 10000""".stripMargin

  /** CTE stack: toks → word 3-gram shingles → distinct → 48-bit hashes →
    * 64 affine minhashes (mod 2^31-1). */
  private val sigCte =
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |s AS (SELECT doc_id, CASE WHEN len(toks) < 3 THEN []::VARCHAR[]
       |        ELSE list_transform(range(1, len(toks)-1),
       |               i -> array_to_string(toks[i:i+2], ' ')) END AS sh FROM t),
       |d AS (SELECT doc_id, list_distinct(sh) AS shd FROM s WHERE len(sh) > 0),
       |h AS (SELECT doc_id, list_transform(shd, x -> ${hash48Sql("x")}) AS hs FROM d),
       |g AS (SELECT doc_id, list_transform(range(0,64), i ->
       |        list_min(list_transform(hs,
       |          x -> ((2*i+1)*(x % 2147483647) + (i*i+1)) % 2147483647))) AS sig FROM h),
       |bands AS (SELECT g.doc_id, r.band,
       |        md5(array_to_string(sig[r.band*4+1 : r.band*4+4], ',')) AS band_key
       |      FROM g CROSS JOIN (SELECT range AS band FROM range(0,16)) r)""".stripMargin

  /** Near-dup cluster graph CTEs (require `WITH RECURSIVE`): verified LSH
    * pairs → symmetric edges → transitive closure. Shared by q77 (labels)
    * and q148 (representatives). */
  private val clusterGraphCtes =
    s"""base AS (
       |  SELECT id_a, id_b FROM (
       |    WITH $sigCte,
       |    hd AS (SELECT doc_id, list_distinct(hs) AS hsd FROM h),
       |    cands AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
       |          FROM bands l JOIN bands r
       |            ON l.band = r.band AND l.band_key = r.band_key
       |           AND l.doc_id < r.doc_id)
       |    SELECT id_a, id_b FROM cands
       |      JOIN hd a ON a.doc_id = id_a JOIN hd b ON b.doc_id = id_b
       |      WHERE CAST(len(list_intersect(a.hsd, b.hsd)) AS DOUBLE) /
       |            CAST(len(list_distinct(list_concat(a.hsd, b.hsd))) AS DOUBLE)
       |            >= 0.5)),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM base
       |          UNION SELECT id_b, id_a FROM base),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst)""".stripMargin

  /** Component-min label per clustered doc (the q77 result shape). */
  private val clusterLabelsSelect =
    """SELECT n.id AS doc_id,
      |  least(n.id, (SELECT min(dst) FROM reach WHERE src = n.id))
      |    AS cluster_id
      |FROM (SELECT DISTINCT src AS id FROM edges) n""".stripMargin

  /** BPE oracle CTE stack (DuckDB needs `WITH RECURSIVE`): whitespace
    * words → per-word longest-match recursion (pure scalar CASE in the
    * recursive term — [[graft.functions.BpeVocab.advanceCaseSql]], no
    * join/aggregate, so every SQL engine's recursion rules accept it) →
    * consumed pieces → id lookup → per-word piece count / id sum
    * (`wstat`), plus `dw` (doc_id, word) for the per-document rollup.
    * Tokenizing DISTINCT words once and joining back is also exactly how
    * a 100 TB pipeline would amortize subword tokenization. */
  private val bpeCte: String = {
    val v = graft.functions.BpeVocab.demo
    val adv = v.advanceCaseSql("w", "pos")
    s"""vocab(piece, id) AS (VALUES ${v.valuesSql}),
       |dw AS (SELECT doc_id, unnest($toksSql) AS w FROM documents),
       |words AS (SELECT DISTINCT w FROM dw WHERE len(w) > 0),
       |steps(w, pos, piece) AS (
       |  SELECT w, 1, CAST(NULL AS VARCHAR) FROM words
       |  UNION ALL
       |  SELECT w, pos + $adv, substr(w, pos, $adv)
       |  FROM steps WHERE pos <= len(w)),
       |pieces AS (SELECT w, piece FROM steps WHERE piece IS NOT NULL),
       |wstat AS (SELECT p.w, count(*) AS np,
       |    sum(coalesce(v.id, ${graft.functions.BpeVocab.UnkId})) AS ids
       |  FROM pieces p LEFT JOIN vocab v ON v.piece = p.piece
       |  GROUP BY p.w)""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // SEQUENCE PACKING (pretraining batch prep): assign each document to a
    // fixed-budget bin in doc_id order via the DISTRIBUTED two-phase prefix
    // sum (per-partition cumsum + broadcast offsets) — the naive global
    // window would drag the whole corpus through ONE task at 100 TB
    // (plan-asserted partitioned windows in SeqPackSpec). Oracle replays
    // the equivalent single-window formulation in DuckDB.
    Q("q102_sequence_packing",
      """SELECT doc_id, n_chars,
        |  CAST(FLOOR(COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    / 4000.0) AS BIGINT) AS bin
        |FROM documents
        |""".stripMargin) { (s, d) =>
      graft.operators.SeqPack
        .packBins(docs(s, d).select("doc_id", "n_chars"),
          "doc_id", "n_chars", budget = 4000L)
        .select("doc_id", "n_chars", "bin")
    },

    // DETERMINISTIC TRAIN/VAL/TEST SPLIT: content-hash bucketing of the
    // doc id (md5 hex → 0..99), NOT randomSplit — the same row lands in
    // the same split on any cluster/partitioning/rerun, and growing the
    // corpus never reshuffles prior assignments. Pure projection, no
    // shuffle. Oracle replays the identical hash arithmetic.
    Q("q103_split_assign",
      """SELECT doc_id, lang,
        |  CASE WHEN b < 80 THEN 'train'
        |       WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id, lang,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 100
        |    AS b FROM documents)
        |""".stripMargin) { (s, d) =>
      graft.text.Sampling
        .assignSplit(docs(s, d).select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "split")
    },

    // Exact dedup groups: content-hash groupBy (one uniform shuffle).
    Q("q28_dedup_exact",
      """SELECT md5(text) AS text_md5, min(doc_id) AS keep_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1
        |""".stripMargin) { (s, d) =>
      TextDedup.exactDupGroups(docs(s, d), "doc_id", "text")
    },

    // Token/length statistics — the per-document filter signals.
    Q("q29_text_stats",
      s"""SELECT doc_id, lang,
         |  CAST(length(text) AS BIGINT) AS n_chars_measured,
         |  CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct($toksSql)) AS BIGINT) AS n_distinct_tokens,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_subwords
         |FROM documents
         |""".stripMargin) { (s, d) =>
      docs(s, d).select(
        col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("n_chars_measured"),
        TextStats.tokenCount(col("text")).as("n_tokens"),
        TextStats.distinctTokenCount(col("text")).as("n_distinct_tokens"),
        TextStats.subwordCount(col("text")).as("n_subwords"))
    },

    // Stopword-argmax language heuristic (deterministic tie order).
    Q("q37_lang_id",
      s"""WITH c AS (SELECT doc_id, lang,
         |  list_transform($toksSql, x -> lower(x)) AS lt FROM documents),
         |n AS (SELECT doc_id, lang,
         |  CAST(len(list_filter(lt, x -> x IN ($stopEn))) AS BIGINT) AS c_en,
         |  CAST(len(list_filter(lt, x -> x IN ($stopEs))) AS BIGINT) AS c_es,
         |  CAST(len(list_filter(lt, x -> x IN ($stopFr))) AS BIGINT) AS c_fr,
         |  CAST(len(list_filter(lt, x -> x IN ($stopDe))) AS BIGINT) AS c_de
         |FROM c)
         |SELECT doc_id, lang,
         |  ${langPredCaseSql("c_en", "c_es", "c_fr", "c_de")} AS lang_pred,
         |  c_en AS n_stopwords_en
         |FROM n
         |""".stripMargin) { (s, d) =>
      docs(s, d).select(
        col("doc_id"), col("lang"),
        TextStats.languageId(col("text")).as("lang_pred"),
        TextStats.stopwordHitsFor(col("text"), "en").as("n_stopwords_en"))
    },

    // Composite quality score (clamped linear blend, Parity-rounded).
    Q("q38_quality_score",
      s"""SELECT doc_id, $qualityScoreSql AS quality_score
         |FROM documents
         |""".stripMargin) { (s, d) =>
      docs(s, d).select(
        col("doc_id"),
        TextStats.qualityScore(col("text")).as("quality_score"))
    },

    // MinHash-LSH bucket table: 64 affine minhashes, 16 bands × 4 rows.
    Q("q39_minhash_bands",
      s"""WITH $sigCte
         |SELECT doc_id, band, band_key FROM bands
         |""".stripMargin) { (s, d) =>
      TextDedup.minhashBands(docs(s, d), "doc_id", "text")
    },

    // Near-dup pairs: LSH candidates verified by exact Jaccard over the
    // distinct 48-bit shingle-hash sets (the oracle replays the identical
    // hashing, so the sets — and the Jaccard — match bit-for-bit).
    Q("q40_neardup_pairs",
      s"""WITH $sigCte,
         |hd AS (SELECT doc_id, list_distinct(hs) AS hsd FROM h),
         |cands AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
         |      FROM bands l JOIN bands r
         |        ON l.band = r.band AND l.band_key = r.band_key
         |       AND l.doc_id < r.doc_id)
         |SELECT id_a, id_b,
         |  CAST(len(list_intersect(a.hsd, b.hsd)) AS DOUBLE) /
         |  CAST(len(list_distinct(list_concat(a.hsd, b.hsd))) AS DOUBLE) AS jaccard
         |FROM cands JOIN hd a ON a.doc_id = id_a JOIN hd b ON b.doc_id = id_b
         |WHERE CAST(len(list_intersect(a.hsd, b.hsd)) AS DOUBLE) /
         |      CAST(len(list_distinct(list_concat(a.hsd, b.hsd))) AS DOUBLE) >= 0.5
         |""".stripMargin) { (s, d) =>
      TextDedup.nearDupPairs(docs(s, d), "doc_id", "text")
    },

    // INCREMENTAL NEAR-DUP (corpus-growth shape): the corpus's MinHash band
    // index is PERSISTED as a lake table (appended per ingested batch);
    // deduping a new batch shingles ONLY the batch, bucket-joins its bands
    // against the store, and exact-verifies candidate docs alone — the
    // 100 TB corpus's text is never rescanned, only its (id, band, key)
    // index rows and the few candidate docs. Oracle: identical signature
    // pipeline with candidates restricted to corpus×batch.
    Q("q117_incremental_neardup",
      s"""WITH $sigCte,
         |hd AS (SELECT doc_id, list_distinct(hs) AS hsd FROM h),
         |cands AS (SELECT DISTINCT l.doc_id AS id_corpus, r.doc_id AS id_new
         |      FROM bands l JOIN bands r
         |        ON l.band = r.band AND l.band_key = r.band_key
         |       AND l.doc_id % 3 <> 0 AND r.doc_id % 3 = 0)
         |SELECT id_corpus, id_new,
         |  CAST(len(list_intersect(a.hsd, b.hsd)) AS DOUBLE) /
         |  CAST(len(list_distinct(list_concat(a.hsd, b.hsd))) AS DOUBLE) AS jaccard
         |FROM cands JOIN hd a ON a.doc_id = id_corpus
         |            JOIN hd b ON b.doc_id = id_new
         |WHERE CAST(len(list_intersect(a.hsd, b.hsd)) AS DOUBLE) /
         |      CAST(len(list_distinct(list_concat(a.hsd, b.hsd))) AS DOUBLE) >= 0.5
         |""".stripMargin) { (s, d) =>
      val all = docs(s, d)
      val corpus = all.filter(col("doc_id") % 3 =!= 0)
      val batch = all.filter(col("doc_id") % 3 === 0)
      // The persisted signature store: band index keyed by doc id, the
      // state an incremental ingest pipeline appends to per batch. REUSED
      // across runs via a corpus content signature: SOURCE DIR + member
      // count + id-hash xor — an id-column-only scan, never the text
      // (content mutation of a lake-table corpus goes through its own
      // versioning). The source dir is part of the identity: two SF dirs
      // can carry the SAME ids with DIFFERENT text (sf0.001 vs sf0.01 in
      // the driver's testdata do), so ids alone would reuse a stale store.
      val sigRow = corpus
        .select(xxhash64(col("doc_id")).as("__h"))
        .agg(count(lit(1)).as("n"),
          // bit_xor: order-independent and can't overflow (a full-range
          // hash SUM trips ANSI arithmetic)
          expr("bit_xor(__h)").as("x"))
        .head()
      val contentSig = s"$d|${sigRow.getLong(0)}:${sigRow.get(1)}"
      val storeTbl = graft.storage.CowTable.replaceIfChanged(s,
        StorageQueries.tableDir("q117_sigstore"),
        graft.storage.TableConfig("sig_store", Seq("doc_id")),
        contentSig,
        TextDedup.minhashBands(corpus, "doc_id", "text"))
      TextDedup.incrementalNearDupPairs(
        storeTbl.read(), corpus, batch, "doc_id", "text")
    },

    // Near-dup pairs confirmed by character-level edit distance: the LSH +
    // Jaccard candidates re-scored with levenshtein and a length-normalized
    // similarity — the second-stage verifier a dedup pipeline runs before
    // dropping a document. Pair count is LSH-bounded (never all-pairs), so
    // the O(len^2) distance only touches candidate pairs.
    Q("q71_edit_distance",
      s"""WITH $sigCte,
         |hd AS (SELECT doc_id, list_distinct(hs) AS hsd FROM h),
         |cands AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
         |      FROM bands l JOIN bands r
         |        ON l.band = r.band AND l.band_key = r.band_key
         |       AND l.doc_id < r.doc_id),
         |p AS (SELECT id_a, id_b,
         |  CAST(len(list_intersect(a.hsd, b.hsd)) AS DOUBLE) /
         |  CAST(len(list_distinct(list_concat(a.hsd, b.hsd))) AS DOUBLE) AS jaccard
         |FROM cands JOIN hd a ON a.doc_id = id_a JOIN hd b ON b.doc_id = id_b
         |WHERE CAST(len(list_intersect(a.hsd, b.hsd)) AS DOUBLE) /
         |      CAST(len(list_distinct(list_concat(a.hsd, b.hsd))) AS DOUBLE) >= 0.5)
         |SELECT p.id_a, p.id_b, p.jaccard,
         |  CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_distance,
         |  floor((1.0 - CAST(levenshtein(da.text, db.text) AS DOUBLE) /
         |    greatest(len(da.text), len(db.text))) * 10000 + 0.5) / 10000
         |    AS norm_sim
         |FROM p JOIN documents da ON da.doc_id = p.id_a
         |       JOIN documents db ON db.doc_id = p.id_b
         |""".stripMargin) { (s, d) =>
      val dd = docs(s, d)
      val pairs = TextDedup.nearDupPairs(dd, "doc_id", "text")
      val ta = dd.select(col("doc_id").as("id_a"), col("text").as("__ta"))
      val tb = dd.select(col("doc_id").as("id_b"), col("text").as("__tb"))
      val lev = levenshtein(col("__ta"), col("__tb"))
      pairs.join(ta, "id_a").join(tb, "id_b")
        .select(col("id_a"), col("id_b"), col("jaccard"),
          lev.cast("long").as("edit_distance"),
          graft.core.Parity.round4(lit(1.0) - lev.cast("double") /
            greatest(length(col("__ta")), length(col("__tb"))))
            .as("norm_sim"))
    },

    // 48-bit SimHash per document (frequency-weighted ±1 bit votes).
    Q("q41_simhash",
      s"""WITH h AS (SELECT doc_id,
         |  list_transform($toksSql, x -> ${hash48Sql("x")}) AS hs FROM documents),
         |b AS (SELECT doc_id, list_transform(range(0,48), j ->
         |  list_sum(list_transform(hs, x ->
         |    CASE WHEN (x // CAST(power(2,j) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END))) AS bs
         |FROM h)
         |SELECT doc_id, CAST(list_sum(list_transform(range(0,48), j ->
         |  CASE WHEN bs[j+1] > 0 THEN CAST(power(2,j) AS BIGINT) ELSE 0 END)) AS BIGINT) AS simhash
         |FROM b
         |""".stripMargin) { (s, d) =>
      TextDedup.simhashes(docs(s, d), "doc_id", "text")
    },

    // Winnowing fingerprints (3-gram shingles, window 4).
    Q("q42_fingerprints",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, CASE WHEN len(toks) < 3 THEN []::VARCHAR[]
         |        ELSE list_transform(range(1, len(toks)-1),
         |               i -> array_to_string(toks[i:i+2], ' ')) END AS sh FROM t),
         |h AS (SELECT doc_id, list_transform(sh, x -> ${hash48Sql("x")}) AS hs FROM s),
         |w AS (SELECT doc_id, CASE WHEN len(hs) < 4 THEN []::BIGINT[]
         |        ELSE list_distinct(list_transform(range(1, len(hs)-2),
         |               i -> list_min(hs[i:i+3]))) END AS fps FROM h)
         |SELECT doc_id, unnest(fps) AS fingerprint FROM w
         |""".stripMargin) { (s, d) =>
      TextDedup.fingerprints(docs(s, d), "doc_id", "text")
    },

    // SimHash near-dup pairs: bit-slice buckets (pigeonhole candidates) +
    // exact Hamming verify — all integer math, oracle replays it exactly.
    Q("q54_simhash_pairs",
      s"""WITH h AS (SELECT doc_id,
         |  list_transform($toksSql, x -> ${hash48Sql("x")}) AS hs FROM documents),
         |b AS (SELECT doc_id, list_transform(range(0,48), j ->
         |  list_sum(list_transform(hs, x ->
         |    CASE WHEN (x // CAST(power(2,j) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END))) AS bs
         |FROM h),
         |sh AS (SELECT doc_id, CAST(list_sum(list_transform(range(0,48), j ->
         |  CASE WHEN bs[j+1] > 0 THEN CAST(power(2,j) AS BIGINT) ELSE 0 END)) AS BIGINT) AS simhash
         |FROM b),
         |bands AS (SELECT doc_id, simhash, c.chunk,
         |    (simhash // CAST(power(2, c.chunk*12) AS BIGINT)) % 4096 AS key
         |  FROM sh CROSS JOIN (SELECT range AS chunk FROM range(0,4)) c),
         |cands AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
         |    l.simhash AS sa, r.simhash AS sb
         |  FROM bands l JOIN bands r ON l.chunk = r.chunk AND l.key = r.key
         |    AND l.doc_id < r.doc_id)
         |SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         |FROM cands WHERE bit_count(xor(sa, sb)) <= 3
         |""".stripMargin) { (s, d) =>
      TextDedup.simhashNearDupPairs(docs(s, d), "doc_id", "text")
    },

    // Character-level Rabin–Karp rolling-hash fingerprints (native O(n)
    // expression; window 32 bytes, stride 8). All arithmetic is mod 1e9+7
    // in int64, so the oracle recomputes each window hash DIRECTLY (sum of
    // byte*B^k — same residue, no rolling state needed) from hex(blob)
    // bytes with the power table embedded as literals.
    Q("q52_rolling_fingerprint", {
      val M = 1000000007L
      val B = 131L
      // POWS[j+1] = B^(31-j) mod M, j = 0..31
      val pows = Iterator.iterate(1L)(p => p * B % M).take(32)
        .toSeq.reverse.mkString("[", ",", "]")
      s"""WITH b AS (SELECT doc_id, hex(CAST(text AS BLOB)) AS hx,
         |             octet_length(CAST(text AS BLOB)) AS n FROM documents),
         |ba AS (SELECT doc_id, n, list_transform(range(0, n),
         |         i -> ('0x' || substr(hx, CAST(2*i+1 AS INT), 2))::BIGINT)
         |         AS bs
         |       FROM b WHERE n >= 32),
         |h AS (SELECT doc_id, list_distinct(list_transform(
         |        list_filter(range(0, n - 31), s -> s % 8 = 0),
         |        s -> CAST(list_sum(list_transform(range(0, 32),
         |               j -> bs[CAST(s + j + 1 AS INT)] *
         |                    ($pows::BIGINT[])[CAST(j + 1 AS INT)]))
         |             % $M AS BIGINT))) AS fps
         |      FROM ba)
         |SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fingerprint FROM h
         |""".stripMargin
    }) { (s, d) =>
      TextDedup.rollingFingerprints(docs(s, d), "doc_id", "text")
    },

    // Near-dup clustering: connected components over the verified pair graph
    // (pairs chain — a~b, b~c is ONE cluster even when a~c was never a
    // candidate), labeled by component-min doc_id. Spark side converges by
    // min-label propagation; the oracle replays it as a recursive transitive
    // closure.
    Q("q77_neardup_clusters",
      s"""WITH RECURSIVE $clusterGraphCtes
         |$clusterLabelsSelect
         |""".stripMargin) { (s, d) =>
      TextDedup.nearDupClusters(
        TextDedup.nearDupPairs(docs(s, d), "doc_id", "text"))
    },

    // Canonical-document selection per near-dup family: for each cluster,
    // keep the longest member (ties → lowest doc_id) — the "which copy
    // survives dedup" policy step. One map-side-combinable struct-max
    // aggregate over the cluster labels (no per-cluster sort/window on the
    // Spark side; the oracle uses the window form).
    Q("q148_cluster_representatives",
      s"""WITH RECURSIVE $clusterGraphCtes,
         |labels AS ($clusterLabelsSelect),
         |m AS (SELECT l.cluster_id, dd.doc_id, dd.n_chars,
         |        count(*) OVER (PARTITION BY l.cluster_id) AS cluster_size,
         |        row_number() OVER (PARTITION BY l.cluster_id
         |          ORDER BY dd.n_chars DESC, dd.doc_id) AS rn
         |      FROM labels l JOIN documents dd ON dd.doc_id = l.doc_id)
         |SELECT cluster_id, CAST(cluster_size AS BIGINT) AS cluster_size,
         |  doc_id AS rep_doc_id, n_chars AS rep_n_chars
         |FROM m WHERE rn = 1
         |""".stripMargin) { (s, d) =>
      val clusters = TextDedup.nearDupClusters(
        TextDedup.nearDupPairs(docs(s, d), "doc_id", "text"))
      clusters.join(
          docs(s, d).select(col("doc_id"), col("n_chars")), "doc_id")
        .groupBy(col("cluster_id"))
        .agg(
          count(lit(1)).as("cluster_size"),
          max(struct(col("n_chars"), (-col("doc_id")).as("_negid")))
            .as("_best"))
        .select(col("cluster_id"), col("cluster_size"),
          (-col("_best")("_negid")).as("rep_doc_id"),
          col("_best")("n_chars").as("rep_n_chars"))
    },

    // End-to-end corpus build — the canonical LLM-data pipeline composed
    // from the individually-verified operators: language filter (heuristic
    // agrees with the labeled lang), quality threshold, near-dup removal
    // (drop the higher doc_id of each verified pair), and a deterministic
    // hash-based 80% sample. Every stage is the same code the per-operator
    // queries check; the oracle composes their SQL replays.
    Q("q74_corpus_build",
      s"""WITH $sigCte,
         |hd AS (SELECT doc_id, list_distinct(hs) AS hsd FROM h),
         |cands AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
         |      FROM bands l JOIN bands r
         |        ON l.band = r.band AND l.band_key = r.band_key
         |       AND l.doc_id < r.doc_id),
         |losers AS (SELECT DISTINCT id_b FROM cands
         |  JOIN hd a ON a.doc_id = id_a JOIN hd b ON b.doc_id = id_b
         |  WHERE CAST(len(list_intersect(a.hsd, b.hsd)) AS DOUBLE) /
         |        CAST(len(list_distinct(list_concat(a.hsd, b.hsd))) AS DOUBLE)
         |        >= 0.5),
         |lt AS (SELECT doc_id, lang,
         |  list_transform($toksSql, x -> lower(x)) AS lw FROM documents),
         |cn AS (SELECT doc_id,
         |  len(list_filter(lw, x -> x IN ($stopEn))) AS c_en,
         |  len(list_filter(lw, x -> x IN ($stopEs))) AS c_es,
         |  len(list_filter(lw, x -> x IN ($stopFr))) AS c_fr,
         |  len(list_filter(lw, x -> x IN ($stopDe))) AS c_de
         |  FROM lt),
         |lp AS (SELECT doc_id,
         |  ${langPredCaseSql("c_en", "c_es", "c_fr", "c_de")} AS lang_pred
         |  FROM cn),
         |qs AS (SELECT doc_id, $qualityScoreSql AS quality_score
         |  FROM documents)
         |SELECT dc.doc_id, dc.lang, dc.source, qs.quality_score
         |FROM documents dc
         |JOIN lp ON lp.doc_id = dc.doc_id
         |JOIN qs ON qs.doc_id = dc.doc_id
         |WHERE lp.lang_pred = dc.lang
         |  AND qs.quality_score >= 0.5
         |  AND dc.doc_id NOT IN (SELECT id_b FROM losers)
         |  AND ${hash48Sql("dc.text")} % 10 < 8
         |""".stripMargin) { (s, d) =>
      val dd = docs(s, d)
      val losers = TextDedup.nearDupPairs(dd, "doc_id", "text")
        .select(col("id_b").as("doc_id")).distinct()
      dd.select(col("doc_id"), col("lang"), col("source"),
          TextStats.languageId(col("text")).as("__lang_pred"),
          TextStats.qualityScore(col("text")).as("quality_score"),
          TextFunctions.md5Hash48(col("text")).as("__h"))
        .filter(col("__lang_pred") === col("lang") &&
          col("quality_score") >= 0.5 && col("__h") % 10 < 8)
        .join(losers, Seq("doc_id"), "left_anti")
        .select("doc_id", "lang", "source", "quality_score")
    },

    // Exact-dedup projection: keep one row (min doc_id) per distinct text.
    Q("q45_dedup_keep",
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
        |""".stripMargin) { (s, d) =>
      TextDedup.dedupExact(docs(s, d), "doc_id", "text")
        .select("doc_id", "lang", "source", "n_chars")
    },

    // PII REDACTION: regex scrub of emails/phones/IPs with audit counts.
    // The corpus has no organic PII, so the fixture plants a deterministic
    // mix per doc_id on BOTH sides (same string algebra in Spark and SQL);
    // the redaction itself — ordered, digit-free placeholders, counts from
    // the ORIGINAL text — is the operator under test. Pure projection.
    Q("q112_pii_redact",
      raw"""WITH p AS (SELECT doc_id,
           |  text || ' contact user' || CAST(doc_id AS VARCHAR) ||
           |    '@example.com' ||
           |  CASE WHEN doc_id % 3 = 0 THEN ' call 555-123-4567' ELSE '' END ||
           |  CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.' ||
           |    CAST(doc_id % 256 AS VARCHAR) || '.1' ELSE '' END AS pii
           |  FROM documents)
           |SELECT doc_id,
           |  CAST(len(regexp_extract_all(pii,
           |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
           |    AS n_emails,
           |  CAST(len(regexp_extract_all(pii,
           |    '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT) AS n_phones,
           |  CAST(len(regexp_extract_all(pii,
           |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
           |  regexp_replace(regexp_replace(regexp_replace(pii,
           |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
           |    '<EMAIL>', 'g'),
           |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
           |    '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS redacted
           |FROM p
           |""".stripMargin) { (s, d) =>
      val pii = concat(
        col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com"),
        when(col("doc_id") % 3 === 0, " call 555-123-4567").otherwise(""),
        when(col("doc_id") % 5 === 0,
          concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
            lit(".1"))).otherwise(""))
      docs(s, d).select(col("doc_id"), pii.as("__pii"))
        .select(col("doc_id"),
          Redact.countEmails(col("__pii")).as("n_emails"),
          Redact.countPhones(col("__pii")).as("n_phones"),
          Redact.countIpv4(col("__pii")).as("n_ips"),
          Redact.redactPii(col("__pii")).as("redacted"))
    },

    // REPETITION SIGNALS (Gopher-style quality heuristics): longest
    // identical-token run + top-bigram share, each a single-pass O(1)-state
    // fold inside the row (see Repetition scaladoc) — the oracle replays
    // them relationally (RLE via the row_number-difference trick).
    Q("q113_repetition_signals",
      raw"""WITH t AS (SELECT doc_id,
           |  string_split_regex(trim(text), '\s+') AS toks FROM documents),
           |u AS (SELECT doc_id, unnest(toks) AS tok,
           |  generate_subscripts(toks, 1) AS i FROM t),
           |r AS (SELECT doc_id, tok, i - ROW_NUMBER()
           |  OVER (PARTITION BY doc_id, tok ORDER BY i) AS grp FROM u),
           |runs AS (SELECT doc_id, count(*) AS rl FROM r
           |  GROUP BY doc_id, tok, grp),
           |mr AS (SELECT doc_id, max(rl) AS max_token_run FROM runs
           |  GROUP BY doc_id),
           |b AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 2
           |    THEN []::VARCHAR[]
           |    ELSE list_transform(range(1, len(toks)),
           |      i -> toks[i] || ' ' || toks[i+1]) END) AS bg FROM t),
           |bc AS (SELECT doc_id, bg, count(*) AS n FROM b GROUP BY 1, 2),
           |tb AS (SELECT doc_id, max(n) AS top_bigram_n FROM bc
           |  GROUP BY doc_id)
           |SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
           |  CAST(mr.max_token_run AS BIGINT) AS max_token_run,
           |  CAST(coalesce(tb.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
           |  CASE WHEN len(toks) < 2 THEN 0.0
           |    ELSE floor(CAST(coalesce(tb.top_bigram_n, 0) AS DOUBLE) /
           |      CAST(len(toks) - 1 AS DOUBLE) * 10000 + 0.5) / 10000
           |  END AS top_bigram_frac
           |FROM t JOIN mr USING (doc_id) LEFT JOIN tb USING (doc_id)
           |""".stripMargin) { (s, d) =>
      docs(s, d).select(col("doc_id"),
        // all four columns read the SAME fused profile struct — identical
        // subexpressions are eliminated, so this is one pass per document
        Repetition.profile(col("text")).getField("n_tokens").as("n_tokens"),
        Repetition.maxTokenRun(col("text")).as("max_token_run"),
        Repetition.topBigramCount(col("text")).as("top_bigram_n"),
        Repetition.topBigramFraction(col("text")).as("top_bigram_frac"))
    },

    // BENCHMARK CONTAMINATION: distinct word-3-gram hashes shared with the
    // benchmark subset (doc_id % 97 = 0 stands in for an eval set). The
    // benchmark side is DISTINCT-reduced and BROADCAST — at 100 TB the
    // corpus side never shuffles for the join (see Contamination scaladoc).
    Q("q114_contamination",
      raw"""WITH t AS (SELECT doc_id,
           |  string_split_regex(trim(text), '\s+') AS toks FROM documents),
           |s AS (SELECT doc_id, unnest(
           |    CASE WHEN len(toks) < 3 THEN []::VARCHAR[]
           |    ELSE list_transform(range(1, len(toks)-1),
           |      i -> array_to_string(toks[i:i+2], ' ')) END) AS sh FROM t),
           |h AS (SELECT DISTINCT doc_id,
           |  ${hash48Sql("sh")} AS hv FROM s),
           |bench AS (SELECT DISTINCT hv FROM h WHERE doc_id % 97 = 0)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
           |FROM h JOIN bench USING (hv) WHERE doc_id % 97 <> 0
           |GROUP BY doc_id
           |""".stripMargin) { (s, d) =>
      Contamination.ngramOverlap(docs(s, d), "doc_id", "text",
        isBench = col("doc_id") % 97 === 0, k = 3)
    },

    // MIXTURE-STRATIFIED SAMPLING: exact per-source caps in deterministic
    // (md5(id), id) order — domain-mixture control for a data release. The
    // hex sort key compares identically in both engines.
    Q("q115_stratified_sample",
      """SELECT doc_id, source, rn FROM (
        |  SELECT doc_id, source, ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) WHERE rn <= 12
        |""".stripMargin) { (s, d) =>
      Sampling.stratifiedCap(docs(s, d), "source", "doc_id", cap = 12)
        .select("doc_id", "source", "rn")
    },

    // TOKEN-BUDGET MIXTURE ("3 GB of web, 1 GB of code"): documents
    // admitted per source in deterministic (md5, id) order until the
    // stratum's char budget is exhausted — the boundary-crossing doc is
    // admitted (fill-until-full). Integer prefix sums over a unique sort
    // key: both engines replay the exact membership and running totals.
    Q("q169_token_budget_mixture",
      """SELECT doc_id, source, n_chars, cum_weight FROM (
        |  SELECT doc_id, source, n_chars,
        |    CAST(sum(n_chars) OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_weight
        |  FROM documents)
        |WHERE cum_weight - n_chars < 5000
        |""".stripMargin) { (s, d) =>
      Sampling.tokenBudgetCap(docs(s, d), "source", "doc_id", "n_chars",
        5000L)
        .select("doc_id", "source", "n_chars", "cum_weight")
    },

    // RATE-BASED MIXTURE SAMPLING (temperature-weighted source mixing):
    // keep source s at its configured rate via the integer hash threshold
    // md5-48(id) < floor(rate * 2^48) — shuffle-free (no window, unlike
    // q115's exact caps), deterministic, and the thresholds are literal
    // longs computed ONCE driver-side, so the oracle's comparison is
    // bit-identical with zero per-row float arithmetic.
    Q("q121_mixture_sample", {
      val cases = MixRates.map { case (s, r) =>
        s"WHEN '$s' THEN ${Sampling.rateThreshold(r)}" }.mkString(" ")
      s"""SELECT doc_id, source FROM documents
         |WHERE ${hash48Sql("CAST(doc_id AS VARCHAR)")} <
         |  CASE source $cases ELSE 0 END
         |""".stripMargin
    }) { (s, d) =>
      Sampling.rateSample(docs(s, d), "source", "doc_id", MixRates.toMap)
        .select("doc_id", "source")
    },

    // TOKEN-WINDOW CHUNKING (context-window sample construction): 40-token
    // windows at stride 20 (50% overlap), final window truncated. Pure
    // projection + explode — no shuffle; the oracle replays the identical
    // integer slicing (DuckDB list slices clamp exactly like Spark slice).
    Q("q123_token_chunks",
      raw"""WITH t AS (SELECT doc_id,
           |    string_split_regex(trim(text), '\s+') AS toks FROM documents),
           |c AS (SELECT doc_id, toks,
           |    unnest(range(0, CAST(greatest(
           |      ceil((len(toks) - 40) / 20.0), 0) AS BIGINT) + 1))
           |      AS chunk_idx
           |  FROM t)
           |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           |  array_to_string(toks[chunk_idx*20 + 1 : chunk_idx*20 + 40], ' ')
           |    AS chunk_text,
           |  CAST(len(toks[chunk_idx*20 + 1 : chunk_idx*20 + 40]) AS BIGINT)
           |    AS n_chunk_tokens
           |FROM c
           |""".stripMargin) { (s, d) =>
      Chunker.tokenWindows(docs(s, d), "doc_id", "text",
        window = 40, stride = 20)
    },

    // SUBWORD (BPE/WordPiece-style) TOKEN COUNTS: per-document piece count
    // and piece-id checksum under the demo vocabulary's longest-match
    // tokenization ([[graft.functions.BpeVocab]]) — the "real token"
    // budget columns that replace whitespace-token proxies in a training
    // pipeline. Fused native expression (one pass, vocab trie on the
    // plan); oracle replays longest-match with a recursive CTE over the
    // DISTINCT words, generated from the SAME Scala vocab constant.
    Q("q124_bpe_tokens",
      s"""WITH RECURSIVE $bpeCte
         |SELECT d.doc_id,
         |  CAST(coalesce(sum(s.np), 0) AS BIGINT) AS n_bpe_tokens,
         |  CAST(coalesce(sum(s.ids), 0) AS BIGINT) AS bpe_id_sum
         |FROM dw d LEFT JOIN wstat s ON s.w = d.w
         |GROUP BY d.doc_id
         |""".stripMargin) { (s, d) =>
      docs(s, d)
        .select(col("doc_id"),
          graft.functions.Bpe.encode(col("text")).as("__ids"))
        .select(col("doc_id"),
          size(col("__ids")).cast("long").as("n_bpe_tokens"),
          aggregate(col("__ids"), lit(0L), (acc, x) => acc + x)
            .as("bpe_id_sum"))
    },

    // SEQUENCE PACKING IN REAL TOKENS: q102's distributed two-phase prefix
    // sum, but budgeted in BPE tokens (512-token bins) instead of chars —
    // what an actual pretraining batch builder packs by.
    Q("q125_bpe_packing",
      s"""WITH RECURSIVE $bpeCte,
         |dstat AS (SELECT d.doc_id,
         |    CAST(coalesce(sum(s.np), 0) AS BIGINT) AS n_bpe_tokens
         |  FROM dw d LEFT JOIN wstat s ON s.w = d.w
         |  GROUP BY d.doc_id)
         |SELECT doc_id, n_bpe_tokens,
         |  CAST(FLOOR(COALESCE(SUM(n_bpe_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    / 512.0) AS BIGINT) AS bin
         |FROM dstat
         |""".stripMargin) { (s, d) =>
      val counts = docs(s, d).select(col("doc_id"),
        size(graft.functions.Bpe.encode(col("text")))
          .cast("long").as("n_bpe_tokens"))
      graft.operators.SeqPack
        .packBins(counts, "doc_id", "n_bpe_tokens", budget = 512L)
        .select("doc_id", "n_bpe_tokens", "bin")
    },

    // BPE VOCABULARY TRAINING (Sennrich '16 — the merge-LEARNING half of
    // q124's fixed-vocab encode): 6 distributed merge rounds over the
    // distinct-word table, deterministic tie-break (count DESC, pair ASC),
    // leftmost-greedy application made relational via the parity rule
    // ([[graft.text.BpeTrain]]). The oracle replays the ENTIRE training
    // trajectory as unrolled CTEs — best pair AND merge application per
    // round — the q140 k-means discipline.
    Q("q219_bpe_train",
      graft.text.BpeTrain.fitSql(rounds = 6)) { (s, d) =>
      graft.text.BpeTrain.fit(docs(s, d), "text", rounds = 6)
    },

    // BM25 TOP-K KEYWORD SEARCH: inverted-index scoring over the corpus —
    // rational-idf BM25 with integer nano-unit contributions so the score
    // is bit-exact and order-independent (see [[graft.text.Search]]).
    // Broadcast |terms|-row df table; top-k via TakeOrderedAndProject
    // (per-partition heaps, no global sort).
    Q("q127_bm25_search",
      graft.text.Search.bm25OracleSql(BmQueryTerms, k = 25)) { (s, d) =>
      graft.text.Search.bm25TopK(docs(s, d), "doc_id", "text",
        BmQueryTerms, k = 25)
    },

    // DATA-QUALITY EXPECTATIONS with QUARANTINE routing (the DLT
    // expect_or_drop shape, complementing fail-loud CHECK constraints):
    // one shuffle-free projection tags each document with the rules it
    // failed (false OR NULL fails — constraint semantics); clean rows flow
    // on, quarantined rows carry the failed-rule list for triage. Oracle
    // replays each rule as a CASE flag; concat_ws skips NULLs identically
    // in both engines, so the joined rule list is string-exact.
    Q("q178_expectations_quarantine",
      """SELECT doc_id, concat_ws(',',
        |    CASE WHEN NOT coalesce(n_chars >= 120, FALSE) THEN 'min_len' END,
        |    CASE WHEN NOT coalesce(lang IN ('en','de','fr'), FALSE)
        |      THEN 'known_lang' END,
        |    CASE WHEN NOT coalesce(length(trim(text)) > 0, FALSE)
        |      THEN 'nonempty' END) AS failed_rules
        |FROM documents
        |WHERE NOT (coalesce(n_chars >= 120, FALSE)
        |  AND coalesce(lang IN ('en','de','fr'), FALSE)
        |  AND coalesce(length(trim(text)) > 0, FALSE))
        |""".stripMargin) { (s, d) =>
      val rules = Seq(
        "min_len" -> "n_chars >= 120",
        "known_lang" -> "lang IN ('en','de','fr')",
        "nonempty" -> "length(trim(text)) > 0")
      val (_, quarantined) =
        graft.operators.Expectations.split(docs(s, d), rules)
      quarantined.select(col("doc_id"),
        array_join(col(graft.operators.Expectations.FailedColumn), ",")
          .as("failed_rules"))
    },

    // EXPECTATIONS AUDIT METRICS (the DLT event-log counters): per rule —
    // failed, passed, and SOLE failures ("rows this rule alone
    // quarantines", the fix-this-first triage number). One aggregate pass
    // over the corpus regardless of rule count; the oracle replays each
    // counter as a conditional sum.
    Q("q180_expectation_metrics",
      """WITH f AS (SELECT
        |    CASE WHEN NOT coalesce(n_chars >= 120, FALSE)
        |      THEN 1 ELSE 0 END AS f1,
        |    CASE WHEN NOT coalesce(lang IN ('en','de','fr'), FALSE)
        |      THEN 1 ELSE 0 END AS f2,
        |    CASE WHEN NOT coalesce(length(trim(text)) > 0, FALSE)
        |      THEN 1 ELSE 0 END AS f3
        |  FROM documents),
        |a AS (SELECT count(*) AS n,
        |    sum(f1) AS s1, sum(f2) AS s2, sum(f3) AS s3,
        |    sum(CASE WHEN f1 = 1 AND f2 + f3 = 0 THEN 1 ELSE 0 END) AS o1,
        |    sum(CASE WHEN f2 = 1 AND f1 + f3 = 0 THEN 1 ELSE 0 END) AS o2,
        |    sum(CASE WHEN f3 = 1 AND f1 + f2 = 0 THEN 1 ELSE 0 END) AS o3
        |  FROM f)
        |SELECT 'min_len' AS rule, CAST(s1 AS BIGINT) AS failed,
        |  CAST(n - s1 AS BIGINT) AS passed, CAST(o1 AS BIGINT) AS sole_failed
        |FROM a
        |UNION ALL SELECT 'known_lang', CAST(s2 AS BIGINT),
        |  CAST(n - s2 AS BIGINT), CAST(o2 AS BIGINT) FROM a
        |UNION ALL SELECT 'nonempty', CAST(s3 AS BIGINT),
        |  CAST(n - s3 AS BIGINT), CAST(o3 AS BIGINT) FROM a
        |""".stripMargin) { (s, d) =>
      graft.operators.Expectations.metrics(docs(s, d), Seq(
        "min_len" -> "n_chars >= 120",
        "known_lang" -> "lang IN ('en','de','fr')",
        "nonempty" -> "length(trim(text)) > 0"))
    },

    // TEMPERATURE-flattened language mix (α = 1/2, the multilingual-LM
    // sampling rule): per-lang targets ∝ floor(sqrt(n)) scaled to a
    // 200-doc cap in integer arithmetic, then the deterministic (md5, id)
    // prefix of each lang — en's 38.6% raw share flattens toward the tail
    // langs'. Integer-exact throughout (floor∘sqrt and DIV), so the
    // oracle replays the identical selection.
    Q("q186_temperature_mix",
      """WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |w AS (SELECT lang, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT)
        |        AS w FROM n),
        |t AS (SELECT lang, CAST(200 * w // (SELECT sum(w) FROM w) AS BIGINT)
        |        AS target FROM w),
        |r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |      FROM documents)
        |SELECT r.doc_id, r.lang, CAST(r.rn AS BIGINT) AS rn
        |FROM r JOIN t ON t.lang = r.lang WHERE r.rn <= t.target
        |""".stripMargin) { (s, d) =>
      Sampling.temperatureMix(
        docs(s, d).select("doc_id", "lang"), "lang", "doc_id", 200L)
        .select("doc_id", "lang", "rn")
    },

    // DETERMINISTIC GLOBAL TRAINING ORDER ("shuffle once, train
    // anywhere"): a seeded md5 permutation of the corpus materialized as
    // an explicit 0-based rank — every epoch/restart/engine reading the
    // corpus sees the SAME order with no re-shuffle. Never a
    // single-partition `row_number() OVER (ORDER BY ...)` (the whole
    // corpus through one task): a deterministic key-prefix bucket
    // (monotone in the key — never a sampled range partitioner, whose
    // boundaries drift run to run) + per-bucket distributed rank +
    // O(buckets) offsets. The oracle replays the naive global window —
    // exactness of the scalable form against the textbook one.
    Q("q199_training_order",
      """SELECT doc_id, CAST(row_number() OVER (
        |    ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)), doc_id)
        |  - 1 AS BIGINT) AS ord
        |FROM documents
        |""".stripMargin) { (s, d) =>
      graft.operators.GlobalOrder.rank(
        docs(s, d).select("doc_id"), "doc_id", "epoch0", numPartitions = 8)
        .select("doc_id", "ord")
    },

    // LINEAR TEXT-CLASSIFIER SCORING (the fastText-style quality-filter
    // shape): score(doc) = Σ_tokens weight[md5-bucket(token)] over 64
    // hashed feature buckets — the inference pass a corpus-quality filter
    // runs over every document. NO UDF anywhere: split/lower/md5/conv and
    // one hash aggregate, all codegen'd; the weights here are a
    // deterministic function of the bucket so the oracle replays the
    // whole model bit-exactly (a real model just swaps in a broadcast
    // weight table — same plan shape).
    Q("q200_linear_classifier",
      raw"""WITH occ AS (SELECT doc_id, lower(w) AS w FROM (
           |    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+'))
           |      AS w FROM documents) WHERE len(w) > 0),
           |f AS (SELECT doc_id,
           |    ((('0x' || substr(md5(w), 1, 12))::BIGINT % 64) % 13) - 6
           |      AS wt FROM occ)
           |SELECT doc_id, CAST(sum(wt) AS BIGINT) AS score,
           |  CAST(count(*) AS BIGINT) AS n_tokens,
           |  sum(wt) > 0 AS positive
           |FROM f GROUP BY doc_id
           |""".stripMargin) { (s, d) =>
      val w = explode(split(trim(lower(col("text"))), "\\s+")).as("w")
      val bucket = conv(substring(md5(col("w")), 1, 12), 16, 10)
        .cast("long") % 64L
      docs(s, d).select(col("doc_id"), w)
        .filter(length(col("w")) > 0)
        .groupBy("doc_id")
        .agg(sum(bucket % 13L - 6L).as("score"),
          count(lit(1)).as("n_tokens"))
        .select(col("doc_id"), col("score"), col("n_tokens"),
          (col("score") > 0).as("positive"))
    },

    // FUZZY (edit-distance) JOIN — entity matching on near-identical keys:
    // every customer-name pair within Levenshtein 1, found EXACTLY via
    // q-gram prefix filtering (ED-Join), never all-pairs. The adversarial
    // part is real here: every name shares the "Customer#0000…" template,
    // so a naive shared-gram join is quadratic on the template grams —
    // rarest-first prefixes keep those grams OUT of the candidate index.
    // Oracle = brute force with the length prefilter on the same probe
    // subset (bounded: the subset keeps the cross join sub-second).
    Q("q201_fuzzy_join",
      """WITH n AS (SELECT c_custkey AS id, c_name AS s FROM customer
        |           WHERE c_custkey % 20 = 0)
        |SELECT a.id AS id_1, b.id AS id_2,
        |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        |FROM n a JOIN n b ON a.id < b.id
        |  AND abs(length(a.s) - length(b.s)) <= 1
        |  AND levenshtein(a.s, b.s) <= 1
        |""".stripMargin) { (s, d) =>
      graft.text.FuzzyJoin.editDistanceJoin(
        Tables.table(s, d, "customer")
          .filter(col("c_custkey") % 20 === 0)
          .select(col("c_custkey"), col("c_name")),
        "c_custkey", "c_name", maxDist = 1)
    },

    // EXPECTATIONS-GATED LAKE INGEST (the quarantine DEPLOYMENT form):
    // batch 1 arrives with doc_id%10==0 rows MALFORMED (null n_chars →
    // quarantined under constraint semantics), batch 2 re-delivers them
    // repaired — repaired rows MOVE to the main table and their quarantine
    // ghosts are deleted, still-broken rows re-quarantine with their real
    // failed set. Final state is therefore exactly q178's split on the
    // ORIGINAL values (the lifecycle is the point; the oracle is the
    // steady state), and the in-query require asserts main ∪ quarantine
    // partitions the corpus.
    Q("q185_quarantine_ingest",
      """SELECT doc_id, concat_ws(',',
        |    CASE WHEN NOT coalesce(n_chars >= 120, FALSE) THEN 'min_len' END,
        |    CASE WHEN NOT coalesce(lang IN ('en','de','fr'), FALSE)
        |      THEN 'known_lang' END,
        |    CASE WHEN NOT coalesce(length(trim(text)) > 0, FALSE)
        |      THEN 'nonempty' END) AS failed_rules
        |FROM documents
        |WHERE NOT (coalesce(n_chars >= 120, FALSE)
        |  AND coalesce(lang IN ('en','de','fr'), FALSE)
        |  AND coalesce(length(trim(text)) > 0, FALSE))
        |""".stripMargin) { (s, d) =>
      import graft.operators.Expectations
      import graft.storage.{CowTable, TableConfig}
      val base = StorageQueries.tableDir("q185")
      CowTable.deleteRecursively(java.nio.file.Paths.get(base))
      val rules = Seq(
        "min_len" -> "n_chars >= 120",
        "known_lang" -> "lang IN ('en','de','fr')",
        "nonempty" -> "length(trim(text)) > 0")
      val main = CowTable(s, base + "/main",
        TableConfig("docs_clean", Seq("doc_id")))
      val quar = CowTable(s, base + "/quarantine",
        TableConfig("docs_quarantine", Seq("doc_id")))
      val d0 = docs(s, d)
      val malformed = d0.withColumn("n_chars",
        when(col("doc_id") % 10 === 0, lit(null)).otherwise(col("n_chars")))
      Expectations.quarantineIngest(main, quar, malformed, rules)
      Expectations.quarantineIngest(main, quar,
        d0.filter(col("doc_id") % 10 === 0), rules)
      val (mainN, quarN) = (main.read().count(), quar.read().count())
      require(mainN + quarN == d0.count(),
        s"main($mainN) + quarantine($quarN) must partition the corpus")
      quar.read().select("doc_id", "failed_rules")
    },

    // LEAKAGE-SAFE train/val/test split: assign the split by NEAR-DUP
    // CLUSTER, not by document — near-duplicates of a training doc must
    // never land in val/test (the contamination rule a per-doc hash split
    // silently violates). Unclustered docs are their own singleton cluster
    // (cluster_id = doc_id), so the assignment degrades to q103's exact
    // shape where no near-dups exist. Composition of two proven
    // primitives: q77's clustering + q103's deterministic md5 bucket,
    // keyed on the cluster label.
    Q("q181_leakage_safe_split",
      s"""WITH RECURSIVE $clusterGraphCtes,
         |labels AS ($clusterLabelsSelect),
         |wc AS (SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id)
         |         AS cluster_id
         |       FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN b < 80 THEN 'train'
         |       WHEN b < 90 THEN 'val' ELSE 'test' END AS split
         |FROM (SELECT doc_id, cluster_id,
         |  ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 6))::BIGINT
         |    % 100 AS b FROM wc) s
         |""".stripMargin) { (s, d) =>
      val d0 = docs(s, d)
      val clusters = TextDedup.nearDupClusters(
        TextDedup.nearDupPairs(d0, "doc_id", "text"))
      val withCluster = d0.select("doc_id")
        .join(clusters, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      graft.text.Sampling.assignSplit(withCluster, "cluster_id")
        .select("doc_id", "cluster_id", "split")
    },

    // INCREMENTAL PERSISTED BM25 INDEX (the keyword member of the
    // incremental-index trio, with q117's band index and q139's IVF):
    // the corpus ingested in TWO batches into lake tables postings(w,
    // doc_id, tf) — range-CLUSTERED on the term, so probes open O(terms)
    // files — and doclen; the probe answers from the index alone, the
    // corpus is never rescanned. Index state is a pure function of the
    // ingested set ⇒ the ORACLE IS q127's one-shot replay verbatim, and
    // scores stay bit-exact (same nano-unit expression tree).
    Q("q175_bm25_index_incremental",
      graft.text.Search.bm25OracleSql(BmQueryTerms, k = 25)) { (s, d) =>
      val dir = graft.queries.StorageQueries.tableDir("q175_bm25_idx")
      val sigPath = java.nio.file.Paths.get(dir, "_sig")
      val sig = d
      if (!(java.nio.file.Files.exists(sigPath) &&
          java.nio.file.Files.readString(sigPath).trim == sig)) {
        graft.storage.CowTable.deleteRecursively(
          java.nio.file.Paths.get(dir))
        val corpus = docs(s, d)
        graft.text.Search.indexBatch(s, dir,
          corpus.filter(col("doc_id") % 2 === 0), "doc_id", "text")
        graft.text.Search.indexBatch(s, dir,
          corpus.filter(col("doc_id") % 2 === 1), "doc_id", "text")
        java.nio.file.Files.writeString(sigPath, sig)
      }
      graft.text.Search.searchIndex(s, dir, BmQueryTerms, k = 25)
    },

    // DUPLICATED-SPAN DETECTION (Lee et al., ACL'22, k-gram relaxation):
    // maximal token spans covered by any corpus-repeated word 5-gram.
    // One hash aggregate + join back on the 48-bit shingle hash (both
    // engines group on the SAME hash), then per-document gaps-and-islands
    // span merge — linear, never all-pairs (see [[graft.text.SpanDedup]]).
    Q("q128_dup_spans",
      raw"""WITH t AS (SELECT doc_id,
           |    string_split_regex(trim(text), '\s+') AS toks FROM documents),
           |s AS (SELECT doc_id, CASE WHEN len(toks) < 5 THEN []::VARCHAR[]
           |    ELSE list_transform(range(1, len(toks)-3),
           |      i -> array_to_string(toks[i:i+4], ' ')) END AS sh FROM t),
           |e AS (SELECT doc_id, unnest(range(0, len(sh))) AS pos,
           |    unnest(list_transform(sh, x -> ${hash48Sql("x")})) AS h
           |  FROM s),
           |dup AS (SELECT h FROM e GROUP BY h HAVING count(*) >= 2),
           |p AS (SELECT doc_id, pos, pos - row_number()
           |    OVER (PARTITION BY doc_id ORDER BY pos) AS island
           |  FROM e JOIN dup USING (h))
           |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
           |  CAST(max(pos) + 4 AS BIGINT) AS span_end,
           |  CAST(count(*) AS BIGINT) AS n_dup_shingles
           |FROM p GROUP BY doc_id, island
           |""".stripMargin) { (s, d) =>
      graft.text.SpanDedup.dupSpans(docs(s, d), "doc_id", "text", k = 5)
    },

    // WEIGHTED PRIORITY SAMPLING (Duffield/Lund/Thorup): per-language
    // top-20 by deterministic priority w/u with w = n_chars and u the
    // md5-48 uniform — longer documents win proportionally more often,
    // membership is a pure function of the id, and the arithmetic is
    // pow/ln-free so both engines reproduce every priority bit-for-bit
    // (see [[Sampling.weightedPriority]]).
    Q("q129_weighted_sample",
      s"""WITH p AS (SELECT doc_id, lang, n_chars,
         |    CAST(n_chars AS DOUBLE) * 281474976710656.0 /
         |      (CAST(${hash48Sql("CAST(doc_id AS VARCHAR)")} AS DOUBLE)
         |        + 1.0) AS wpri
         |  FROM documents)
         |SELECT doc_id, lang, n_chars, wpri, wrn FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
         |    ORDER BY wpri DESC, doc_id) AS wrn FROM p)
         |WHERE wrn <= 20
         |""".stripMargin) { (s, d) =>
      Sampling.weightedPriority(docs(s, d), "lang", "doc_id", "n_chars",
        k = 20)
        .select("doc_id", "lang", "n_chars", "wpri", "wrn")
    },

    // SPACE-SAVING HEAVY-HITTER VOCABULARY: single-pass top-token counts
    // with O(cap) state per partial — the vocabulary-head builder. cap 256
    // ≥ the corpus vocabulary, so the sketch is in its EXACT regime and
    // the oracle's exact group-by reproduces it (the eviction/overflow
    // path is spec-tested, [[graft.functions.SpaceSaving]]).
    Q("q130_vocab_heavy_hitters",
      raw"""SELECT w AS token, CAST(count(*) AS BIGINT) AS cnt
           |FROM (SELECT lower(unnest(
           |    string_split_regex(trim(text), '\s+'))) AS w FROM documents)
           |WHERE len(w) > 0 GROUP BY w
           |""".stripMargin) { (s, d) =>
      docs(s, d)
        .select(explode(graft.text.TextFunctions.tokens(col("text")))
          .as("w"))
        .filter(length(col("w")) > 0)
        .withColumn("w", lower(col("w")))
        .agg(graft.functions.SpaceSaving.topTokens(col("w"), 256).as("m"))
        .select(explode(col("m")).as(Seq("token", "cnt")))
    },

    // STREAMING CORPUS INGEST (the LLM-data front door, end-to-end):
    // documents + planted exact duplicates (doc_id+100001, same text)
    // stream in as multi-file micro-batches; each batch is quality-scored,
    // filtered (≥ 0.55), exact-deduped, and CONVERGENTLY merged into a COW
    // table keyed on the 48-bit text hash — a row lands iff its hash is
    // new or its doc_id beats the incumbent (min-id wins, commutative), so
    // the final table state is a pure function of the input SET, not of
    // micro-batch boundaries. The oracle replays score→filter→min-id-per-
    // hash over the same unioned input in one batch query.
    Q("q132_stream_corpus_ingest",
      s"""WITH u AS (SELECT doc_id, text FROM documents
         |    UNION ALL SELECT doc_id + 100001, text FROM documents),
         |q AS (SELECT doc_id, text,
         |    $qualityScoreSql AS quality FROM u),
         |f AS (SELECT doc_id, quality,
         |    ${hash48Sql("text")} AS text_hash
         |  FROM q WHERE quality >= 0.55),
         |w AS (SELECT doc_id, quality, text_hash, row_number()
         |    OVER (PARTITION BY text_hash ORDER BY doc_id) AS rn FROM f)
         |SELECT doc_id, text_hash, quality FROM w WHERE rn = 1
         |""".stripMargin) { (s, d) =>
      val base = StorageQueries.tableDir("q132")
      graft.storage.CowTable
        .deleteRecursively(java.nio.file.Paths.get(base))
      val src = base + "/src"
      val dd = docs(s, d).select("doc_id", "text")
      dd.unionAll(dd.select((col("doc_id") + 100001L).as("doc_id"),
          col("text")))
        .repartition(4, col("doc_id"))
        .write.mode("overwrite").parquet(src)
      val tbl = graft.storage.CowTable(s, base + "/table",
        graft.storage.TableConfig("corpus", Seq("text_hash")))
      graft.streaming.CorpusIngest.runAvailableNow(s, tbl, src,
        base + "/ckpt",
        new org.apache.spark.sql.types.StructType()
          .add("doc_id", "long").add("text", "string"),
        minQuality = 0.55)
      tbl.read().select("doc_id", "text_hash", "quality")
    },

    // CORPUS OUTLIER DETECTION: per-language length z-score screen with
    // the |z| > 3/2 test done in EXACT integer arithmetic
    // (4·(n·x − Σx)² > 9·(n·Σx² − (Σx)²) — no float threshold wobble; the
    // rational threshold suits near-uniform metrics whose |z| never
    // reaches 2) and the reported z one division over one sqrt of
    // integers, bit-exact cross-engine. One tiny moments aggregate
    // broadcast back — no window, no second data shuffle
    // (see [[graft.text.Outliers]]).
    Q("q136_outlier_docs",
      """WITH st AS (SELECT lang, count(*) AS n, sum(n_chars) AS s,
        |    sum(n_chars * n_chars) AS ss FROM documents GROUP BY lang),
        |j AS (SELECT d.doc_id, d.lang, d.n_chars,
        |    (st.n * d.n_chars - st.s) AS num,
        |    (st.n * st.ss - st.s * st.s) AS dd
        |  FROM documents d JOIN st USING (lang))
        |SELECT doc_id, lang, n_chars,
        |  CAST(num AS DOUBLE) / sqrt(CAST(dd AS DOUBLE)) AS z
        |FROM j WHERE num * num * 4 > 9 * dd
        |""".stripMargin) { (s, d) =>
      graft.text.Outliers
        .zOutliers(docs(s, d), "lang", "n_chars", tNum = 3, tDen = 2)
        .select("doc_id", "lang", "n_chars", "z")
    },

    // CORPUS-UNIGRAM LM SCORING (CCNet-style perplexity filter signal):
    // per-document mean token surprisal against the corpus unigram LM,
    // with surprisal the INTEGER bit count floor(log2(total DIV cnt)) —
    // length(bin(x))-1, no transcendental ln, so the score replays
    // bit-for-bit cross-engine (see [[graft.text.LangModel]]). Scale:
    // two linear hash aggregates + a (doc,term)⋈(term,cnt) shuffle join;
    // the corpus text never reshuffles.
    // THE CURATION FUNNEL, end to end in one oracle-gated query — the
    // composition the engine exists for: per-doc quality blend + corpus-LM
    // mean surprisal → threshold gate → deterministic per-source
    // stratified cap. Every stage is an already-proven primitive (q38,
    // q138, q115); composing them shows the joins/filters keep the
    // bit-exact discipline (quality floor-rounded, surprisal Parity-
    // rounded, md5-ordered sampling — no new float wobble appears at the
    // seams). Plan: the corpus tokenizes once inside unigramSurprisal
    // (checkpointed doc-term frame), quality is a fused single-pass
    // native, the gate join is doc_id-keyed, the cap shuffles only
    // survivors.
    Q("q164_curation_funnel",
      s"""WITH q AS (SELECT doc_id, source,
         |    $qualityScoreSql AS quality_score FROM documents),
         |k AS (SELECT q.doc_id, q.source, q.quality_score, s.mean_bits
         |  FROM q JOIN (${graft.text.LangModel.unigramSurprisalSql}) s
         |    ON s.doc_id = q.doc_id
         |  WHERE q.quality_score >= 0.3 AND s.mean_bits <= 13.0)
         |SELECT doc_id, source, quality_score, mean_bits, rn FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY source
         |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
         |  FROM k) WHERE rn <= 20
         |""".stripMargin) { (s, d) =>
      val q = docs(s, d).select(col("doc_id"), col("source"),
        TextStats.qualityScore(col("text")).as("quality_score"))
      val sup = graft.text.LangModel.unigramSurprisal(docs(s, d),
        "doc_id", "text").select(col("doc_id"), col("mean_bits"))
      val kept = q.join(sup, "doc_id")
        .filter(col("quality_score") >= 0.3 && col("mean_bits") <= 13.0)
      Sampling.stratifiedCap(kept, "source", "doc_id", 20)
        .select("doc_id", "source", "quality_score", "mean_bits", "rn")
    },

    Q("q138_unigram_surprisal", graft.text.LangModel.unigramSurprisalSql) {
      (s, d) => graft.text.LangModel.unigramSurprisal(docs(s, d), "doc_id", "text")
    },

    // Conditional (bigram) LM surprisal — q138's next fidelity step:
    // per-position bits = floor(log2(ctx(w1) DIV cnt(w1,w2))) with the
    // bigram-context denominator. Pairs built columnar (slice+zip — no
    // positional self-join); only the compact (doc,w1,w2,tf) frame
    // shuffles.
    Q("q151_bigram_surprisal", graft.text.LangModel.bigramSurprisalSql) {
      (s, d) => graft.text.LangModel.bigramSurprisal(docs(s, d), "doc_id", "text")
    },

    // TOP-K PER GROUP as a bounded mergeable aggregate ("best 3 docs per
    // language by length"): the window row_number formulation shuffles
    // EVERY row to its group's reducer and sorts; TopKAgg keeps a
    // k-bounded ordered buffer in the map-side partial so only
    // groups × k rows cross the wire. Deterministic (n_chars DESC,
    // doc_id ASC), so the window oracle replays it exactly.
    Q("q142_topk_per_group",
      """SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars, rank
        |FROM (SELECT lang, doc_id, n_chars,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
        |  FROM documents) WHERE rank <= 3
        |""".stripMargin) { (s, d) =>
      docs(s, d).groupBy("lang")
        .agg(graft.functions.TopKAgg
          .topK(col("n_chars").cast("long"), col("doc_id"), 3).as("t"))
        .select(col("lang"), posexplode(col("t")).as(Seq("pos", "e")))
        .select(col("lang"), col("e._2").as("doc_id"),
          col("e._1").as("n_chars"),
          (col("pos") + 1).cast("long").as("rank"))
    },

    // EXACT set-similarity join (AllPairs/PPJoin prefix filtering): every
    // pair with word-set Jaccard ≥ 9/10 — the zero-recall-loss complement
    // of q40's MinHash-LSH, still never all-pairs (rarest-first prefixes
    // bound the candidate join; the exact verify touches candidates
    // only). Rational threshold ⇒ integer-exact boundary test. Probe
    // subset doc_id % 7 = 0: the synthetic docs are heavily templated, so
    // full-corpus high-threshold output would be pair-count-bound, not
    // operator-bound.
    Q("q143_exact_jaccard_join",
      graft.text.PrefixJoin.jaccardJoinSql(9, 10, "doc_id % 7 = 0")) {
      (s, d) =>
      graft.text.PrefixJoin.jaccardJoin(
        docs(s, d).filter(col("doc_id") % 7 === 0),
        "doc_id", "text", 9, 10)
    })
}
