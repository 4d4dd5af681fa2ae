package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the LLM-data-pipeline operators
  * (tokenize, shingle, portable hashing, minhash, simhash, winnowing).
  * Everything is built from `org.apache.spark.sql.functions` higher-order
  * functions — whole-stage-codegen'd, no UDFs, no driver-side loops — so the
  * operators distribute and scale with the scan.
  *
  * Two hash families:
  *  - [[md5Hash48]]: 48-bit positive hash from the md5 hex prefix. Chosen for
  *    engine portability (any SQL engine with md5 reproduces it bit-for-bit,
  *    which is what makes the DuckDB oracles for dedup/simhash exact).
  *  - [[fastHash48]]: xxhash64 masked to 48 bits — the scale path (native
  *    codegen'd hash, ~10× cheaper than md5); same downstream algebra.
  */
object TextFunctions {
  val HashBits = 48
  /** Mersenne prime 2^31-1: modulus of the affine minhash permutations. */
  val MinhashP = 2147483647L

  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def md5Hash48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  def fastHash48(c: Column): Column =
    xxhash64(c).bitwiseAND(lit((1L << 48) - 1))

  /** Sliding word k-grams joined with single spaces; empty array when the
    * text has fewer than k tokens (guards sequence() from descending). */
  def wordShingles(c: Column, k: Int): Column = {
    val t = tokens(c)
    when(size(t) < k, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(t) - (k - 1)),
        i => array_join(slice(t, i, lit(k)), " ")))
  }

  /** numHashes affine minhashes over a hash array:
    * sig[i] = min over h of ((2i+1)·(h mod P) + i²+1) mod P.
    * One base hash per shingle (not per (shingle, i)) — the affine family is
    * cheap arithmetic on top, which is what keeps a 64-hash signature
    * tractable over billions of documents. */
  def minhashSigFromHashes(hashes: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      array_min(transform(hashes, h =>
        ((lit(2L) * i + lit(1L)) * (h % MinhashP) + (i * i + lit(1))) % MinhashP)))

  /** LSH band key: md5 over the comma-joined signature slice for band b
    * (rows consecutive). Two docs share a bucket iff a whole band matches. */
  def bandKey(sig: Column, band: Column, rowsPerBand: Int): Column =
    md5(array_join(
      transform(slice(sig, band * rowsPerBand + 1, lit(rowsPerBand)),
        v => v.cast("string")), ","))

  /** bit j of a 48-bit non-negative hash, via exact double arithmetic
    * (h < 2^48 < 2^53 so h/2^j is exact; portable to engines without
    * variable-shift operators). */
  private def bitOf(h: Column, j: Column): Column =
    pmod(floor(h / pow(lit(2.0), j)).cast("long"), lit(2L))

  /** 48-bit SimHash over a token-hash array: per bit, sum ±1 over tokens
    * (frequency-weighted), bit set iff the sum is positive. */
  def simhashFromHashes(hashes: Column): Column = {
    val idx = sequence(lit(0), lit(HashBits - 1))
    val bitSums = transform(idx, j =>
      aggregate(hashes, lit(0L), (acc, h) => acc + (bitOf(h, j) * 2 - lit(1L))))
    val powers = transform(idx, j => pow(lit(2.0), j).cast("long"))
    aggregate(
      zip_with(bitSums, powers, (s, p) => when(s > 0, p).otherwise(lit(0L))),
      lit(0L), (a, b) => a + b)
  }

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03 scheme shape): min
    * hash of each sliding window of `w` shingle hashes, deduplicated. A
    * document pair sharing any fingerprint shares a length-(k+w-1) word
    * span — the scalable containment/plagiarism probe. */
  def winnowFingerprints(hashes: Column, w: Int): Column =
    when(size(hashes) < w, array().cast("array<bigint>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), size(hashes) - (w - 1)),
          i => array_min(slice(hashes, i, lit(w))))))

  /** Hamming distance between two [[simhashFromHashes]] values. */
  def hammingDistance(a: Column, b: Column): Column = {
    val x = a.bitwiseXOR(b)
    aggregate(
      transform(sequence(lit(0), lit(HashBits - 1)), j => bitOf(x, j)),
      lit(0L), (acc, v) => acc + v)
  }
}
