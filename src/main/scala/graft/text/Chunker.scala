package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-token-window document chunking with stride — the context-window
  * sample constructor of training/RAG pipelines (window = model context
  * budget, stride < window = overlap for continuity).
  *
  * Pure projection + explode: windows are slices of the row's own token
  * array, so the operator scales with corpus bytes — no shuffle, no state.
  * Window starts are 0, stride, 2·stride, … up to the smallest start whose
  * window reaches the last token (`ceil((n - window) / stride)`, clamped at
  * 0) — every token lands in at least one chunk and no window is fully
  * contained in its predecessor; the final window truncates (`slice`
  * clamps) when the tail is short. All arithmetic is integer-exact and the
  * chunk text is a space-join of whitespace tokens, which an external
  * engine replays exactly (list slicing clamps identically in DuckDB).
  */
object Chunker {

  /** The chunk array itself — ARRAY<STRUCT<chunk_text, n_chunk_tokens>>,
    * one element per window, in start order. Composable scalar form (also
    * the SQL surface: `token_chunks(text, window, stride)` via
    * [[graft.GraftExtensions]]); [[tokenWindows]] is the exploded
    * one-row-per-chunk relation over it. */
  def chunkStructs(text: Column, window: Int, stride: Int): Column = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = TextFunctions.tokens(text)
    def chunkAt(i: Column): Column =
      slice(toks, i * stride + 1, lit(window))
    transform(
      // last start = max(0, ceil((n - window) / stride)); Column `/` is
      // double division — exact here, token counts sit far below 2^53
      sequence(lit(0),
        greatest(
          ceil((size(toks) - lit(window)) / lit(stride)), lit(0L))
          .cast("int")),
      i => struct(
        array_join(chunkAt(i), " ").as("chunk_text"),
        size(chunkAt(i)).cast("long").as("n_chunk_tokens")))
  }

  /** One row per (id, chunk): `chunk_idx` (0-based), `chunk_text`, and
    * `n_chunk_tokens` (= window except for the truncated tail). */
  def tokenWindows(
      df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame =
    df.select(
      col(idCol),
      posexplode(chunkStructs(col(textCol), window, stride))
        .as(Seq("chunk_idx", "c")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("c.chunk_text").as("chunk_text"),
        col("c.n_chunk_tokens").as("n_chunk_tokens"))
}
