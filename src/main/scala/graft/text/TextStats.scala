package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import TextFunctions.tokens

/** Text quality / analysis operators: token statistics, stopword-based
  * language ID, and a composite quality score — the filtering signals a
  * training-data pipeline computes over every document. All pure
  * `functions._` arithmetic (codegen'd, deterministic, engine-portable).
  */
object TextStats {

  /** Tiny per-language stopword lists for the n-gram-free language
    * heuristic. Deliberately small: the operator shape (token-set membership
    * counting + argmax) is what matters; swap in real lists for production. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "los", "que"),
    "fr" -> Seq("le", "les", "des", "et", "une"),
    "de" -> Seq("der", "die", "das", "und", "ist"))

  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*))).cast("long")

  /** Predicted language: argmax of per-language stopword hits with a
    * deterministic preference order (en > es > fr > de) on ties. */
  def languageId(text: Column): Column = {
    val t = transform(tokens(text), lower(_))
    val hits = stopwords.map { case (lang, ws) => lang -> stopwordHits(t, ws) }
    val Seq(en, es, fr, de) = hits.map(_._2)
    when(en >= es && en >= fr && en >= de, "en")
      .when(es >= fr && es >= de, "es")
      .when(fr >= de, "fr")
      .otherwise("de")
  }

  /** Whitespace token count (split of "" yields one empty token — documented,
    * matches the SQL split semantics oracles replay). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count: letter runs, digit runs, and single
    * non-alphanumeric marks each count as one token. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
      .cast("long")

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  /** Composite quality score in [0,1]: length saturation + lexical diversity
    * + stopword-rate signal (clamped linear blend, IEEE-deterministic). */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val diversity = distinctTokenCount(text).cast("double") / nTok
    val stopRate =
      stopwordHits(transform(tokens(text), lower(_)), stopwords.head._2)
        .cast("double") / nTok
    graft.core.Parity.round4(
      least(nTok / lit(100.0), lit(1.0)) * 0.5 +
        least(diversity, lit(1.0)) * 0.3 +
        least(stopRate * 5.0, lit(1.0)) * 0.2)
  }
}
