package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator

/** Space-Saving heavy-hitters sketch (Metwally/Agrawal/El Abbadi, ICDT'05)
  * as a typed [[Aggregator]] — single-pass top-k token frequencies with
  * O(cap) state per partial aggregate, the vocabulary/heavy-hitter builder
  * that replaces a full `groupBy(token)` shuffle of the entire posting
  * list when only the head of the distribution matters.
  *
  * Scale shape: each partition folds its rows into a ≤cap-entry summary;
  * partials merge pairwise (union-sum, truncate to the cap largest) — the
  * reduce tree moves O(cap) state per partition, never the corpus.
  *
  * Exactness regime (what makes the sketch ORACLE-CHECKABLE, same
  * discipline as the q118 quantile sketch): while the number of distinct
  * keys seen by every partial stays ≤ cap, no eviction fires anywhere and
  * the result is the EXACT frequency map, independent of row order and
  * partitioning. Size `cap` ≥ expected distinct heavy keys (a vocabulary
  * head, not the corpus) and the common case is exact; under overflow the
  * classic guarantees degrade gracefully (counts become upper bounds with
  * error ≤ n/cap) but results become order-dependent — approximate mode is
  * exercised by unit spec, not by the oracle.
  */
object SpaceSaving {

  /** Evict key chosen deterministically GIVEN a buffer state: minimal
    * count, ties broken by largest key (the entry least likely to be a
    * true heavy hitter under lexicographic determinism). */
  private[functions] def evictKey(buf: Map[String, Long]): String = {
    var bw: String = null
    var bc = Long.MaxValue
    buf.foreach { case (w, c) =>
      if (c < bc || (c == bc && (bw == null || w > bw))) { bw = w; bc = c }
    }
    bw
  }

  private[functions] def reduceOne(
      buf: Map[String, Long], w: String, cap: Int): Map[String, Long] =
    buf.get(w) match {
      case Some(c) => buf.updated(w, c + 1)
      case None if buf.size < cap => buf.updated(w, 1L)
      case None =>
        val victim = evictKey(buf)
        val floor = buf(victim)
        (buf - victim).updated(w, floor + 1) // classic SS: inherit min+1
    }

  private[functions] def mergeSummaries(
      a: Map[String, Long], b: Map[String, Long],
      cap: Int): Map[String, Long] = {
    val union = (a.keySet ++ b.keySet).iterator
      .map(w => w -> (a.getOrElse(w, 0L) + b.getOrElse(w, 0L))).toMap
    if (union.size <= cap) union
    else union.toSeq
      .sortBy { case (w, c) => (-c, w) } // keep largest, deterministic
      .take(cap).toMap
  }

  final class Agg(cap: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(cap > 0, s"SpaceSaving: cap must be positive, got $cap")
    override def zero: Map[String, Long] = Map.empty
    override def reduce(buf: Map[String, Long], w: String): Map[String, Long] =
      reduceOne(buf, w, cap)
    override def merge(
        a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      mergeSummaries(a, b, cap)
    override def finish(buf: Map[String, Long]): Map[String, Long] = buf
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Map[String, Long]]()
  }

  /** Column form: aggregate a token column into a ≤cap-entry
    * token → count map. */
  def topTokens(token: Column, cap: Int): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(new Agg(cap)).apply(token)
  }
}
