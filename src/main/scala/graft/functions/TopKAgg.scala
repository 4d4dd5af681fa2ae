package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k-per-group as a mergeable typed [[Aggregator]] — the
  * scale shape for "best k documents per domain/language/source by
  * score", replacing the `row_number() OVER (PARTITION BY g ORDER BY s)`
  * window. The window plan shuffles EVERY row to its group's reducer and
  * sorts there (O(rows) shuffle volume); this aggregate keeps a k-bounded
  * ordered buffer per group in the map-side partial, so only
  * groups × k rows ever cross the wire — at 100 TB with k=3 that is the
  * difference between shuffling the corpus and shuffling a rounding
  * error.
  *
  * Ordering is (score DESC, id ASC) with both values int64 — fully
  * deterministic, so results are partition-independent and the window
  * formulation replays them exactly (the q142 oracle does).
  */
object TopKAgg {

  /** Insert (score, id) into `buf` (ordered score desc, id asc), cap k. */
  private[functions] def insert(buf: Array[(Long, Long)], s: Long, id: Long,
      k: Int): Array[(Long, Long)] = {
    // binary search for the insertion point in the (desc, asc) order
    var lo = 0; var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val (bs, bid) = buf(mid)
      if (bs > s || (bs == s && bid < id)) lo = mid + 1 else hi = mid
    }
    if (lo >= k) buf
    else {
      val n = math.min(buf.length + 1, k)
      val out = new Array[(Long, Long)](n)
      System.arraycopy(buf, 0, out, 0, lo)
      out(lo) = (s, id)
      System.arraycopy(buf, lo, out, lo + 1, n - lo - 1)
      out
    }
  }

  private[functions] def mergeSorted(a: Array[(Long, Long)],
      b: Array[(Long, Long)], k: Int): Array[(Long, Long)] = {
    val out = new Array[(Long, Long)](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length) {
      val takeA = j >= b.length || (i < a.length && {
        val (as, aid) = a(i); val (bs, bid) = b(j)
        as > bs || (as == bs && aid <= bid)
      })
      if (takeA) { out(n) = a(i); i += 1 } else { out(n) = b(j); j += 1 }
      n += 1
    }
    out
  }

  final class Agg(k: Int)
      extends Aggregator[(Long, Long), Array[(Long, Long)],
        Array[(Long, Long)]] {
    require(k >= 1, s"TopKAgg: k must be >= 1 (got $k)")
    override def zero: Array[(Long, Long)] = Array.empty
    override def reduce(buf: Array[(Long, Long)],
        in: (Long, Long)): Array[(Long, Long)] =
      insert(buf, in._1, in._2, k)
    override def merge(a: Array[(Long, Long)],
        b: Array[(Long, Long)]): Array[(Long, Long)] = mergeSorted(a, b, k)
    override def finish(buf: Array[(Long, Long)]): Array[(Long, Long)] = buf
    override def bufferEncoder: Encoder[Array[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Array[(Long, Long)]]()
    override def outputEncoder: Encoder[Array[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Array[(Long, Long)]]()
  }

  /** Column form: array<struct<_1 score, _2 id>> ordered (score desc,
    * id asc), at most k entries — explode with posexplode for ranks. */
  def topK(score: Column, id: Column, k: Int): Column =
    udaf(new Agg(k)).apply(score, id)
}
