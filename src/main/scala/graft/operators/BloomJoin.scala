package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter-pruned semi-join — the runtime-filter technique (Spark's
  * InjectRuntimeFilter / Delta dynamic file pruning) surfaced as an
  * explicit operator for pipelines joining a 100 TB fact side to a
  * filtered dimension:
  *
  *  1. ONE aggregate over the (filtered, small) build side folds its join
  *     keys into an m-bit Bloom bitset (k set positions per key, exact
  *     int64 bit math) — O(m/64) longs of state, mergeable map-side;
  *  2. the bitset rides the PLAN as a literal (the broadcast shape of an
  *     `InSubquery` runtime filter), and the probe side tests membership
  *     in a pure codegen'd projection BEFORE any shuffle: probe rows that
  *     cannot match never leave their input partition;
  *  3. Bloom positives (which include false positives at ~(1-e^{-kn/m})^k)
  *     are finished with the EXACT leftsemi join — the filter changes the
  *     plan's data volume, never its result.
  *
  * Correctness is therefore oracle-trivial (result ≡ plain semi-join) and
  * the pruning itself is asserted in BloomJoinSpec. Hash positions come
  * from `xxhash64(key, seed_j) mod m` computed by the SAME columnar
  * expression on both sides, so build and probe can never disagree.
  */
object BloomJoin {

  /** k hash positions of `key` in an m-bit filter, as an array column.
    * Seeds are the literal 0..k-1: position_j = xxhash64(key, j) mod m. */
  private def positions(key: Column, k: Int, mBits: Int): Column =
    array((0 until k).map(j =>
      pmod(xxhash64(key, lit(j)), lit(mBits.toLong))): _*)

  /** Folds per-row position arrays into the m-bit bitset (as longs). */
  final class BitsetAgg(words: Int)
      extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](words)
    override def reduce(buf: Array[Long], pos: Seq[Long]): Array[Long] = {
      pos.foreach { p =>
        buf((p >>> 6).toInt) |= (1L << (p & 63))
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Build the Bloom bitset from the build side's key column: one
    * hash aggregate, O(mBits/64) longs of driver state. */
  def buildBits(build: DataFrame, keyCol: String, numHashes: Int = 4,
      mBits: Int = 1 << 16): Array[Long] = {
    require(Integer.bitCount(mBits) == 1 && mBits >= 64,
      s"BloomJoin: mBits must be a power of two >= 64 (got $mBits)")
    require(numHashes >= 1 && numHashes <= 16,
      s"BloomJoin: numHashes out of range (got $numHashes)")
    val agg = udaf(new BitsetAgg(mBits / 64))
    build
      .select(positions(col(keyCol), numHashes, mBits).as("__pos"))
      .agg(agg(col("__pos")).as("__bits"))
      .head().getSeq[Long](0).toArray
  }

  /** `probe ⋉ build` on `probeKey = buildKey`, Bloom-prefiltered.
    * The returned frame has probe's schema; rows are exactly the plain
    * leftsemi join's (the Bloom test only prunes, the final semi-join
    * removes false positives). */
  def semiJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      numHashes: Int = 4, mBits: Int = 1 << 16): DataFrame = {
    val bits = buildBits(build, buildKey, numHashes, mBits)
    // no distinct on the build side: leftsemi dedups matches by definition
    prefilter(probe, probeKey, bits, numHashes, mBits)
      .join(build.select(col(buildKey).as(probeKey)), Seq(probeKey),
        "leftsemi")
  }

  /** The probe-side Bloom test alone (exposed for the spec's pruning
    * assertions): keeps rows whose key sets all k bits in `bits`. Pure
    * codegen'd projection — no join, no shuffle. */
  def prefilter(probe: DataFrame, keyCol: String, bits: Array[Long],
      numHashes: Int, mBits: Int): DataFrame = {
    val bitsLit = typedLit(bits.toSeq)
    val pos = positions(col(keyCol), numHashes, mBits)
    val pass = (0 until numHashes).map { j =>
      val p = element_at(pos, j + 1)
      val word = element_at(bitsLit,
        (call_function("shiftrightunsigned", p, lit(6)) + 1).cast("int"))
      call_function("shiftrightunsigned", word, pmod(p, lit(64L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
    probe.filter(pass)
  }
}
