package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Substring-level (span) deduplication: find every maximal token span that
  * participates in a k-gram repeated anywhere in the corpus — the
  * "duplicated training data" detector of Lee et al., ACL'22
  * ("Deduplicating Training Data Makes Language Models Better"), re-expressed
  * relationally instead of via suffix arrays:
  *
  *   1. explode each document into positioned word k-gram hashes
  *      (one row per (doc, pos));
  *   2. a k-gram is DUPLICATED iff its 48-bit hash occurs ≥ 2 times in the
  *      whole corpus (cross- or intra-document — both are repetition a
  *      dedup pass wants to see);
  *   3. per document, merge adjacent duplicated positions into maximal
  *      spans with the gaps-and-islands trick
  *      (`pos - row_number() OVER (PARTITION BY doc ORDER BY pos)` is
  *      constant within a run of consecutive positions).
  *
  * Scale shape: step 2 is ONE hash aggregate over k-gram hashes (linear,
  * map-side partial) followed by a shuffle join back on the hash — never
  * all-pairs, never a cartesian; step 3's window is partitioned by doc_id
  * with O(1) rank state, so the widest state anywhere is one document's
  * positions in one task. The suffix-array formulation this replaces needs
  * a global sort of every suffix; the k-gram relaxation is what every
  * production-scale pipeline (and the paper's own MinHash stage) ships.
  *
  * Determinism: the duplicate test groups on the SAME md5-derived 48-bit
  * hash on both engines (collisions, ~1e-14/pair, collapse identically —
  * same discipline as the q114 contamination oracle).
  */
object SpanDedup {

  /** Positioned k-gram hashes: `(doc_id, pos, h)` with pos 0-based. Uses
    * the fused native tokenize→shingle→md5-48 expression
    * ([[graft.functions.TextTokenExpressions.shingleHash48]], order
    * preserved so the array index IS the position) — the interpreted HOF
    * shingle + per-string md5 path was 8× slower on the sf0.1 bench, and
    * this plan evaluates the shingling twice (once under the duplicate
    * aggregate, once under the join back). */
  def positionedShingleHashes(docsDf: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame = {
    require(k >= 2, s"spanDedup: k must be >= 2, got $k")
    docsDf
      .select(col(idCol).as("doc_id"),
        posexplode(graft.functions.TextTokenExpressions
          .shingleHash48(col(textCol), k, distinct = false))
          .as(Seq("pos", "h")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("h"))
  }

  /** Maximal duplicated spans: `(doc_id, span_start, span_end,
    * n_dup_shingles)` — token indices inclusive, 0-based; `span_end` covers
    * the last token of the last duplicated k-gram in the run. */
  def dupSpans(docsDf: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val e = positionedShingleHashes(docsDf, idCol, textCol, k)
    // corpus-wide duplicate k-gram hashes (NOT broadcast: at 100 TB the
    // duplicated-shingle set is unbounded — shuffle join on h is the shape
    // that survives; AQE converts it to broadcast when it happens to fit)
    val dup = e.groupBy("h").agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
      .select("h")
    val dupPos = e.join(dup, "h").select("doc_id", "pos")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    dupPos
      .withColumn("island", col("pos") - row_number().over(w))
      .groupBy("doc_id", "island")
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k - 1)).as("span_end"),
        count(lit(1)).cast("long").as("n_dup_shingles"))
      .select("doc_id", "span_start", "span_end", "n_dup_shingles")
  }
}
