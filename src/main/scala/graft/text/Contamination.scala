package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination check: for every corpus document, how many of
  * its distinct word k-gram hashes also occur in a designated benchmark
  * document set. Training pipelines run exactly this probe before a data
  * release (eval-set decontamination); a document with any shared k-gram
  * is a candidate for exclusion, and the count ranks severity.
  *
  * Scale shape: the benchmark side collapses to a DISTINCT k-gram-hash set
  * and is broadcast — benchmarks are thousands of documents against a
  * corpus of billions, so the corpus side never shuffles for the join; the
  * only shuffle is the final per-document count aggregation, and map-side
  * partial aggregation collapses each document's hits to one row per
  * partition before it. k-gram extraction reuses [[TextFunctions
  * .wordShingles]] + md5 48-bit hashing, so the DuckDB oracle replays the
  * identical hash space.
  */
object Contamination {

  /** Distinct-k-gram-hash rows of `df`: (idCol, __bench, __hv). Native
    * fused tokenize→shingle→md5-48 ([[graft.functions.ShingleHash48]],
    * distinct on the 48-bit HASH — an intra-document collision between
    * distinct shingles collapses to one row, so the oracle must distinct
    * on the hash expression too, which q114's SQL does): the HOF form
    * exploded shingle STRINGS and re-hashed them interpreted, ~2× the
    * whole query's cost at sf0.1. */
  private def shingleHashes(
      df: DataFrame, idCol: String, textCol: String, isBench: Column,
      k: Int): DataFrame =
    df.select(col(idCol), isBench.as("__bench"),
      explode(graft.functions.TextTokenExpressions
        .shingleHash48(col(textCol), k, distinct = true)).as("__hv"))

  /** Per-document shared-k-gram counts against the benchmark subset
    * (`isBench` rows). Returns only contaminated documents:
    * (idCol, n_shared). Benchmark documents themselves are excluded from
    * the report. */
  def ngramOverlap(
      df: DataFrame, idCol: String, textCol: String, isBench: Column,
      k: Int = 3): DataFrame = {
    val sh = shingleHashes(df, idCol, textCol, isBench, k)
    val bench = sh.filter(col("__bench")).select("__hv").distinct()
    sh.filter(!col("__bench"))
      .join(broadcast(bench), "__hv")
      // __sh rows are distinct per document, so a plain count is the
      // distinct shared-shingle count — no countDistinct state needed
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }
}
