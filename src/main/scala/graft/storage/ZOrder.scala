package graft.storage

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering support for [[CowTable.optimize]] —
  * the OPTIMIZE ZORDER BY surface of the reference's formats (Delta/Hudi
  * clustering), re-expressed as pure Catalyst column arithmetic:
  *
  *  1. each cluster column maps to an 8-bit RANGE ID — its rank among 255
  *     approxQuantile splits (skew-robust, unlike linear min/max
  *     normalization), computed by counting splits <= value over a literal
  *     array (codegen'd comparisons, no UDF, no extra shuffle);
  *  2. the per-column ids bit-interleave into one Z value, so sorting by it
  *     gives every output file a small HYPER-RECTANGLE of the key space —
  *     tight per-file [min,max] on EVERY cluster column at once, where a
  *     lexicographic sort only tightens the leading one.
  *
  * Everything here returns plain `Column`s: the whole Z computation stays
  * inside whole-stage codegen and the only data movement is the final
  * range repartition by Z.
  */
object ZOrder {

  /** Bits (and so quantile splits) per column: 8 ⇒ 256 range buckets,
    * enough to place ~256 files per column axis; 4 columns fit in 32 bits. */
  val Bits: Int = 8

  /** 0..splits.size rank of `c` (a double column) among its sorted quantile
    * splits; nulls rank 0 (they carry no stats and sort first). */
  def rankColumn(c: Column, splits: Seq[Double]): Column = {
    val arr = array(splits.map(lit): _*)
    coalesce(size(filter(arr, s => s <= c)).cast("long"), lit(0L))
  }

  /** 0..splits.size rank of a STRING column among its sorted split literals
    * (engine-side binary UTF-8 `<=`, matching how the splits were sorted);
    * nulls rank 0. Same codegen'd literal-array-comparison shape as
    * [[rankColumn]] — no UDF, no shuffle. */
  def rankStringColumn(c: Column, splits: Seq[String]): Column =
    if (splits.isEmpty) lit(0L)
    else coalesce(
      size(filter(array(splits.map(lit): _*), s => s <= c)).cast("long"),
      lit(0L))

  /** Bit-interleave the per-column ranks: bit i of column j lands at
    * position i*n + j. Bits are disjoint, so OR assembles the Z value.
    *
    * The interleaved width must stay BELOW the long sign bit: position 63
    * would invert the sort order for high ranks, and Java's mod-64 shift
    * wraps silently past it, scrambling the Morton curve for wide clusterBy
    * lists. Rather than reject wide lists, per-column resolution coarsens
    * (keeping the HIGH-order rank bits) so bits·n ≤ 63 always holds. */
  def zvalue(ranked: Seq[Column]): Column = {
    val n = ranked.size
    require(n >= 1, "zvalue needs at least one cluster column")
    val bits = math.min(Bits, 63 / n)
    require(bits >= 1,
      s"zvalue: $n cluster columns cannot interleave within 63 bits")
    val parts = for {
      (r0, j) <- ranked.zipWithIndex
      r = shiftright(r0, Bits - bits)
      i <- 0 until bits
    } yield shiftleft(shiftright(r, i).bitwiseAND(lit(1L)), i * n + j)
    parts.reduce(_.bitwiseOR(_))
  }
}
