package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed time-range join: pair left rows with right rows whose timestamp
  * falls in `[left.ts + lowerSec, left.ts + upperSec]` (inclusive, exact
  * int64 microsecond arithmetic), optionally also equi-keyed.
  *
  * Never a cross join: the time axis is binned at the window span, each
  * right row lands in exactly ONE bin (so no pair dedup is needed), each
  * left row probes the two bins its window can overlap, and the join is a
  * plain equi-join on (keys…, bin) with the exact range predicate applied
  * inside the matched bucket. Shuffle volume is 2×|left| + |right| rows
  * hash-partitioned on (keys…, bin) — the canonical interval-join shape
  * that survives a 100 TB event log (a naive `left.join(right, range
  * predicate)` plans a broadcast-nested-loop or cartesian and dies).
  */
object RangeJoin {

  /** @param payload right columns carried into the output, renamed
    *                (rightCol -> outName); all left columns are kept. */
  def bucketed(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String,
      lowerSec: Long, upperSec: Long,
      payload: Seq[(String, String)]): DataFrame = {
    require(upperSec >= lowerSec, "empty range window")
    val spanUs = math.max((upperSec - lowerSec) * 1000000L, 1L)
    // NTZ-tolerant micros (EventTime): binning + the range predicate use
    // one consistent micros rendering per side, so NTZ input joins exactly
    val lUs = EventTime.micros(left, leftTs)
    val rUs = EventTime.micros(right, rightTs)
    // exact long floor-division (SQL `div` on x - pmod, pmod >= 0): the
    // double-promoting `/` + floor() is exact only while quotient*span stays
    // below 2^53 — an implicit bound this integer form removes outright
    def floorDiv(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      call_function("div", x - pmod(x, lit(spanUs)), lit(spanUs))
    val l = left
      .withColumn("__bin",
        explode(sequence(
          floorDiv(lUs + lowerSec * 1000000L),
          floorDiv(lUs + upperSec * 1000000L))))
    val r = right.select(
      keyCols.map(col) ++ Seq(
        floorDiv(rUs).as("__bin"), rUs.as("__r_us")) ++
        payload.map { case (in, out) => col(in).as(out) }: _*)
    l.join(r, keyCols :+ "__bin")
      .filter(col("__r_us").between(
        lUs + lowerSec * 1000000L,
        lUs + upperSec * 1000000L))
      .drop("__bin", "__r_us")
  }
}
