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
    * tractable over billions of documents. Native codegen'd expression: the
    * HOF form (`transform(seq, i => array_min(transform(hashes, ...)))`)
    * evaluates interpreted AND lets CollapseProject inline the hash array
    * into the outer lambda, re-hashing every shingle numHashes× — observed
    * as a ~60× slowdown at sf0.1. */
  def minhashSigFromHashes(hashes: Column, numHashes: Int): Column =
    graft.functions.HashArrayExpressions.affineMinhashSig(hashes, numHashes)

  /** LSH band key: md5 over the comma-joined signature slice for band b
    * (rows consecutive). Two docs share a bucket iff a whole band matches. */
  def bandKey(sig: Column, band: Column, rowsPerBand: Int): Column =
    md5(array_join(
      transform(slice(sig, band * rowsPerBand + 1, lit(rowsPerBand)),
        v => v.cast("string")), ","))

  /** 48-bit SimHash over a token-hash array: per bit, sum ±1 over tokens
    * (frequency-weighted), bit set iff the sum is positive. Native codegen'd
    * expression (interpreted 48-pass HOF form was the sf0.1 bottleneck). */
  def simhashFromHashes(hashes: Column): Column =
    graft.functions.HashArrayExpressions.simhash48(hashes)

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03 scheme shape): min
    * hash of each sliding window of `w` shingle hashes, deduplicated. A
    * document pair sharing any fingerprint shares a length-(k+w-1) word
    * span — the scalable containment/plagiarism probe. */
  def winnowFingerprints(hashes: Column, w: Int): Column =
    graft.functions.HashArrayExpressions.winnowMins(hashes, w)

  /** Hamming distance between two [[simhashFromHashes]] values. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")
}
