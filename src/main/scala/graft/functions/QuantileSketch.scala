package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Hash-sample quantile sketch as a typed [[Aggregator]] — the quantile
  * companion of [[KmvSketch]] (SURVEY.md §7.3 sketch extension point).
  *
  * State is the k pairs (hash, value) with the SMALLEST (hash, value) order
  * among all rows seen — a uniform row sample whose membership is a pure
  * function of the hash column, so the sketch is DETERMINISTIC and
  * oracle-replayable (`ROW_NUMBER() OVER (ORDER BY hash, value) <= k` in any
  * SQL engine selects the identical multiset). Memory is O(k) per group
  * regardless of group size, merges are associative/commutative (merge two
  * sorted pair lists, cap at k) — the shape that aggregates a 100 TB column
  * with one shuffle of k-row states. Duplicate pairs are KEPT (top-k of a
  * multiset stays associative; dropping them would make a 48-bit hash
  * collision partition-order-dependent).
  *
  * finish() returns linear-interpolation quantiles of the sampled values
  * (`v[lo] + (v[hi] - v[lo]) * frac` at `idx = p*(n-1)` — PERCENTILE_CONT
  * over the sample, written in exactly that IEEE shape so an oracle using
  * the same expression reproduces it bit-for-bit). With fewer than k rows
  * the sample is exhaustive and the quantiles are exact.
  */
object QuantileSketch {

  type Buf = (Array[Long], Array[Double])

  /** (h, v) < (h2, v2) in (hash, value) lexicographic order. */
  @inline private def lt(h: Long, v: Double, h2: Long, v2: Double): Boolean =
    h < h2 || (h == h2 && v < v2)

  private[functions] def insert(buf: Buf, h: Long, v: Double, k: Int): Buf = {
    val (hs, vs) = buf
    val n = hs.length
    if (n >= k && !lt(h, v, hs(n - 1), vs(n - 1))) return buf
    // position: first i with (h, v) < (hs(i), vs(i))
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lt(h, v, hs(mid), vs(mid))) hi = mid else lo = mid + 1
    }
    val m = math.min(n + 1, k)
    val oh = new Array[Long](m)
    val ov = new Array[Double](m)
    System.arraycopy(hs, 0, oh, 0, lo)
    System.arraycopy(vs, 0, ov, 0, lo)
    oh(lo) = h
    ov(lo) = v
    val tail = m - lo - 1
    System.arraycopy(hs, lo, oh, lo + 1, tail)
    System.arraycopy(vs, lo, ov, lo + 1, tail)
    (oh, ov)
  }

  private[functions] def mergeSorted(a: Buf, b: Buf, k: Int): Buf = {
    val m = math.min(a._1.length + b._1.length, k)
    val oh = new Array[Long](m)
    val ov = new Array[Double](m)
    var i = 0; var j = 0; var n = 0
    while (n < m) {
      val takeA = j >= b._1.length ||
        (i < a._1.length && !lt(b._1(j), b._2(j), a._1(i), a._2(i)))
      if (takeA) { oh(n) = a._1(i); ov(n) = a._2(i); i += 1 }
      else { oh(n) = b._1(j); ov(n) = b._2(j); j += 1 }
      n += 1
    }
    (oh, ov)
  }

  /** PERCENTILE_CONT of `sortedVals` (ascending) at `p`, in the exact IEEE
    * shape the SQL oracle mirrors. */
  private[functions] def quantile(sortedVals: Array[Double], p: Double): Double = {
    val n = sortedVals.length
    if (n == 0) return Double.NaN
    val idx = p * (n - 1)
    val lo = math.floor(idx).toInt
    val hi = math.ceil(idx).toInt
    sortedVals(lo) + (sortedVals(hi) - sortedVals(lo)) * (idx - lo)
  }

  final class Agg(k: Int, ps: Seq[Double])
      extends Aggregator[(Long, Double), Buf, Seq[Double]] {
    require(k > 0 && ps.nonEmpty, "need k > 0 and at least one quantile")
    override def zero: Buf = (Array.emptyLongArray, Array.emptyDoubleArray)
    override def reduce(buf: Buf, in: (Long, Double)): Buf =
      insert(buf, in._1, in._2, k)
    override def merge(a: Buf, b: Buf): Buf = mergeSorted(a, b, k)
    override def finish(buf: Buf): Seq[Double] = {
      val vals = buf._2.clone()
      java.util.Arrays.sort(vals)
      ps.map(quantile(vals, _))
    }
    override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
  }

  /** Column form: quantiles of `value` over the k-smallest-(hash, value)
    * sample. `hash48` should be a deterministic per-row hash (e.g.
    * [[graft.text.TextFunctions.md5Hash48]] of a key column). Returns
    * array<double> aligned with `ps`. */
  def sketchQuantiles(hash48: Column, value: Column, k: Int,
      ps: Seq[Double]): Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(new Agg(k, ps)).apply(hash48, value)
  }
}
