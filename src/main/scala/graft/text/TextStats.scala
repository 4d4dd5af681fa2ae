package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import TextFunctions.tokens

/** Text quality / analysis operators: token statistics, stopword-based
  * language ID, and a composite quality score — the filtering signals a
  * training-data pipeline computes over every document.
  *
  * All statistics derive from ONE native single-pass expression
  * ([[graft.functions.TextProfile]]); identical profile subtrees in a
  * projection are evaluated once (whole-stage codegen subexpression
  * elimination), so a select of five stats costs one pass over the text —
  * the HOF form re-tokenized per column, interpreted. The HOF twins remain
  * below (`hofTokenCount` etc.) as the parity-test reference.
  */
object TextStats {
  import graft.functions.TextTokenExpressions.textProfile

  /** Tiny per-language stopword lists for the n-gram-free language
    * heuristic. Deliberately small: the operator shape (token-set membership
    * counting + argmax) is what matters; swap in real lists for production. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "los", "que"),
    "fr" -> Seq("le", "les", "des", "et", "une"),
    "de" -> Seq("der", "die", "das", "und", "ist"))

  /** Per-language stopword hit count from the profile struct. */
  def stopwordHitsFor(text: Column, lang: String): Column =
    textProfile(text).getField(s"c_$lang")

  /** Predicted language: argmax of per-language stopword hits with a
    * deterministic preference order (en > es > fr > de) on ties. */
  def languageId(text: Column): Column = {
    val p = textProfile(text)
    val Seq(en, es, fr, de) =
      Seq("en", "es", "fr", "de").map(l => p.getField(s"c_$l"))
    when(en >= es && en >= fr && en >= de, "en")
      .when(es >= fr && es >= de, "es")
      .when(fr >= de, "fr")
      .otherwise("de")
  }

  /** Whitespace token count (split of "" yields one empty token — documented,
    * matches the SQL split semantics oracles replay). */
  def tokenCount(text: Column): Column =
    textProfile(text).getField("n_tokens")

  /** BPE-ish subword count: letter runs, digit runs, and single
    * non-alphanumeric marks each count as one token. */
  def subwordCount(text: Column): Column =
    textProfile(text).getField("n_subwords")

  def distinctTokenCount(text: Column): Column =
    textProfile(text).getField("n_distinct_tokens")

  /** Composite quality score in [0,1]: length saturation + lexical diversity
    * + stopword-rate signal (clamped linear blend, IEEE-deterministic). */
  def qualityScore(text: Column): Column = {
    val p = textProfile(text)
    val nTok = p.getField("n_tokens").cast("double")
    val diversity = p.getField("n_distinct_tokens").cast("double") / nTok
    val stopRate = p.getField("c_en").cast("double") / nTok
    graft.core.Parity.round4(
      least(nTok / lit(100.0), lit(1.0)) * 0.5 +
        least(diversity, lit(1.0)) * 0.3 +
        least(stopRate * 5.0, lit(1.0)) * 0.2)
  }

  // ---- HOF reference forms (parity-test twins of the native profile) ------

  def hofStopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*))).cast("long")

  def hofTokenCount(text: Column): Column = size(tokens(text)).cast("long")

  def hofDistinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  def hofSubwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
      .cast("long")
}
