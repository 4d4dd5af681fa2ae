package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct-count sketch as a typed [[Aggregator]] — the
  * engine's bounded-memory sketch extension point (SURVEY.md §7.3: an
  * `Aggregator[IN, BUF, OUT]` where built-ins don't cover a north-star op).
  *
  * The sketch keeps the k smallest 48-bit hashes of the values seen. Memory
  * is O(k) per group regardless of group size (unlike collect_set), merges
  * are associative/commutative (merge-sort + cap), and — because the hash is
  * the same md5-derived 48-bit used across the text pipeline — the sketch
  * state and estimate are DETERMINISTIC: an external engine can replay them
  * exactly, so even this approximate operator is oracle-checkable.
  *
  * Estimator: with fewer than k distinct hashes the sketch is exhaustive and
  * exact; otherwise the classic KMV estimate (k-1) * 2^48 / kth_min for
  * hashes uniform on [0, 2^48).
  */
object KmvSketch {

  /** Insert `h` into sorted `buf` (ascending, distinct), capped at `k`. */
  private[functions] def insert(
      buf: Array[Long], h: Long, k: Int): Array[Long] = {
    val i = java.util.Arrays.binarySearch(buf, h)
    if (i >= 0) buf // already present
    else {
      val at = -i - 1
      if (at >= k) buf // larger than the current k minima
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, at)
        out(at) = h
        System.arraycopy(buf, at, out, at + 1, n - at - 1)
        out
      }
    }
  }

  private[graft] def mergeSorted(
      a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    var last = Long.MinValue
    while (n < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { i += 1; a(i - 1) }
        else { j += 1; b(j - 1) }
      if (n == 0 || v != last) { out(n) = v; n = n + 1; last = v }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** Deterministic estimate from a sketch state (sorted ascending). */
  def estimate(mins: Seq[Long], k: Int): Double =
    if (mins.length < k) mins.length.toDouble
    else (k - 1).toDouble * (1L << 48).toDouble / mins.last.toDouble

  final class Agg(k: Int) extends Aggregator[Long, Array[Long], Double] {
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(buf: Array[Long], h: Long): Array[Long] =
      insert(buf, h, k)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      mergeSorted(a, b, k)
    override def finish(buf: Array[Long]): Double =
      estimate(buf.toSeq, k)
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form over a 48-bit-hash column (see
    * [[graft.text.TextFunctions.md5Hash48]]). */
  def kmvDistinct(hash48: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(new Agg(k)).apply(hash48)
  }

  /** STATE-returning variant (sorted k-min hash array, nulls ignored) —
    * what per-file NDV sketches persist in the manifest so scans can merge
    * them per pruned file set (mergeability is the whole point: a KMV
    * union is a merge-sort + cap, exact over any file subset). */
  final class StateAgg(k: Int)
    extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(buf: Array[Long], h: java.lang.Long): Array[Long] =
      if (h == null) buf else insert(buf, h.longValue(), k)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      mergeSorted(a, b, k)
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  def kmvState(hash48: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(new StateAgg(k)).apply(hash48)
  }
}
