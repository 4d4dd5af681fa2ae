package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Repetition signals (Gopher-style quality heuristics): excessive
  * within-document repetition is the strongest single indicator of
  * low-quality/boilerplate text, measured here as (a) the longest run of
  * consecutive identical tokens and (b) the share of all word bigrams
  * claimed by the single most frequent bigram.
  *
  * Both are single-pass HOF folds over the token array of ONE row — no
  * explode, no shuffle, state is O(1) per document — so the operator is a
  * pure projection that scales with corpus bytes, not with any global
  * structure. (A groupBy-per-bigram formulation would explode ~|tokens|
  * rows per document through a shuffle; the fold never leaves the row.)
  */
object Repetition {

  /** Longest run of consecutive identical elements in `arr` (0 for empty).
    * Fold state: (previous element, current run, best run). */
  def maxRunLength(arr: Column): Column =
    aggregate(
      arr,
      struct(lit(null).cast("string").as("p"), lit(0L).as("r"),
        lit(0L).as("b")),
      (acc, x) => {
        val nr = when(acc.getField("p") <=> x, acc.getField("r") + 1L)
          .otherwise(lit(1L))
        struct(x.as("p"), nr.as("r"), greatest(acc.getField("b"), nr).as("b"))
      },
      acc => acc.getField("b"))

  /** Longest token run of the document text. */
  def maxTokenRun(text: Column): Column =
    maxRunLength(TextFunctions.tokens(text))

  /** Occurrences of the most frequent word bigram (0 when fewer than two
    * tokens). Equal bigrams are adjacent after an in-row sort, so the top
    * count is exactly the longest run of the SORTED bigram array — reusing
    * the same O(1)-state fold instead of a per-bigram groupBy. */
  def topBigramCount(text: Column): Column =
    maxRunLength(array_sort(TextFunctions.wordShingles(text, 2)))

  /** Fraction of all bigrams claimed by the top bigram, rounded to 4
    * decimals (engine-portable IEEE); 0.0 when the document has no bigram. */
  def topBigramFraction(text: Column): Column = {
    val nBigrams = size(TextFunctions.tokens(text)) - 1
    graft.core.Parity.round4(
      when(nBigrams < 1, lit(0.0))
        .otherwise(topBigramCount(text).cast("double") /
          nBigrams.cast("double")))
  }
}
