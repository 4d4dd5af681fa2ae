package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Repetition signals (Gopher-style quality heuristics): excessive
  * within-document repetition is the strongest single indicator of
  * low-quality/boilerplate text, measured here as (a) the longest run of
  * consecutive identical tokens and (b) the share of all word bigrams
  * claimed by the single most frequent bigram.
  *
  * Both are computed in ONE native pass over the row's UTF-8 bytes
  * ([[graft.functions.RepetitionProfile]]) — no explode, no shuffle, state
  * is O(tokens) per document — so the operator is a pure projection that
  * scales with corpus bytes, not with any global structure. (A groupBy-
  * per-bigram formulation would explode ~|tokens| rows per document
  * through a shuffle; the profile never leaves the row. The earlier HOF
  * formulation stayed in-row too but evaluated interpreted, ~4 array
  * passes + an O(n log n) bigram sort per document.)
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

  /** One-pass native profile struct(n_tokens, max_token_run, top_bigram_n)
    * — the codegen'd fused form ([[graft.functions.RepetitionProfile]]) of
    * the three signals below. The HOF-fold forms cost ~4 interpreted array
    * passes plus an O(n log n) bigram sort per row; the fused expression is
    * one byte-level pass. Identical columns are subexpression-eliminated,
    * so selecting all three signals still evaluates the profile once. */
  def profile(text: Column): Column =
    graft.functions.TextTokenExpressions.repetitionProfile(text)

  /** Longest token run of the document text. */
  def maxTokenRun(text: Column): Column =
    profile(text).getField("max_token_run")

  /** Occurrences of the most frequent word bigram (0 when fewer than two
    * tokens) — exact string equivalence, same result as the longest run of
    * the SORTED bigram array. */
  def topBigramCount(text: Column): Column =
    profile(text).getField("top_bigram_n")

  /** Fraction of all bigrams claimed by the top bigram, rounded to 4
    * decimals (engine-portable IEEE); 0.0 when the document has no bigram. */
  def topBigramFraction(text: Column): Column = {
    val nBigrams = profile(text).getField("n_tokens") - 1
    graft.core.Parity.round4(
      when(nBigrams < 1, lit(0.0))
        .otherwise(topBigramCount(text).cast("double") /
          nBigrams.cast("double")))
  }
}
