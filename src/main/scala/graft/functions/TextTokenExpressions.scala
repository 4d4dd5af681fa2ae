package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native fused tokenize→shingle→hash expressions for the text-dedup hot
  * path.
  *
  * The HOF form (`transform(array_distinct(wordShingles(text, k)),
  * md5Hash48)`) evaluates interpreted: per shingle it allocates a Column-tree
  * evaluation (md5 → hex string → conv → cast), and the shingle array itself
  * materializes thousands of small UTF8Strings per document. These
  * expressions do the whole pipeline in one compiled pass over the
  * document's UTF-8 bytes — tokens are byte slices, shingles are fed to the
  * digest incrementally (no intermediate strings), distinct-ing dedups on
  * the 48-bit hash (same SET of hash values as distinct-ing the shingle
  * strings, which is all the downstream minhash/Jaccard algebra sees).
  *
  * Tokenization is bit-compatible with the previous
  * `split(trim(text), "\\s+")` form (and the DuckDB oracles'
  * `string_split_regex(trim(text), '\s+')`): trim strips ASCII spaces only;
  * split yields a leading empty token when the trimmed text starts with
  * non-space whitespace, one empty token for empty input, and no trailing
  * empties. Whitespace = Java regex `\s` = ASCII [ \t\n\x0B\f\r].
  */
private[graft] object TextTokenAlgebra {
  final val Hash48Mask = (1L << 48) - 1

  @inline def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private val space = Array[Byte](0x20)

  /** First 48 bits of the md5 digest — identical to
    * `conv(substring(md5(s), 1, 12), 16, 10)` (hex prefix of 12 chars = the
    * first 6 digest bytes, big-endian, always positive). */
  @inline private def digest48(d: java.security.MessageDigest): Long = {
    val g = d.digest()
    ((g(0) & 0xffL) << 40) | ((g(1) & 0xffL) << 32) | ((g(2) & 0xffL) << 24) |
      ((g(3) & 0xffL) << 16) | ((g(4) & 0xffL) << 8) | (g(5) & 0xffL)
  }

  /** Token (start, end) byte offsets into `bytes`, packed [s0,e0,s1,e1,...].
    * Matches `split(trim(s), "\\s+")` = StringSplit with limit -1: leading
    * AND trailing empty tokens are kept when the space-trimmed text starts/
    * ends with non-space whitespace (Java String.split would drop the
    * trailing one — Spark does not). */
  def tokenOffsets(bytes: Array[Byte]): Array[Int] = {
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == 0x20) lo += 1
    while (hi > lo && bytes(hi - 1) == 0x20) hi -= 1
    val out = new scala.collection.mutable.ArrayBuffer[Int](64)
    if (lo == hi) { out += lo; out += lo } // "" → one empty token
    else {
      if (isWs(bytes(lo))) { out += lo; out += lo } // leading empty token
      var i = lo
      while (i < hi) {
        if (isWs(bytes(i))) i += 1
        else {
          val s = i
          while (i < hi && !isWs(bytes(i))) i += 1
          out += s; out += i
        }
      }
      if (isWs(bytes(hi - 1))) { out += hi; out += hi } // trailing empty token
    }
    out.toArray
  }

  /** md5-48 of every token. */
  def tokenHashes(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val offs = tokenOffsets(bytes)
    val n = offs.length / 2
    val out = new Array[Long](n)
    val d = md5.get()
    var i = 0
    while (i < n) {
      d.reset()
      d.update(bytes, offs(2 * i), offs(2 * i + 1) - offs(2 * i))
      out(i) = digest48(d)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** md5-48 of every word k-gram (tokens joined with one space), empty when
    * fewer than k tokens; `distinct` dedups (first occurrence kept). */
  def shingleHashes(s: UTF8String, k: Int, distinct: Boolean): GenericArrayData = {
    val bytes = s.getBytes
    val offs = tokenOffsets(bytes)
    val n = offs.length / 2
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val d = md5.get()
    val m = n - k + 1
    val buf = new scala.collection.mutable.ArrayBuffer[Long](m)
    val seen = if (distinct) new java.util.HashSet[java.lang.Long](m * 2) else null
    var i = 0
    while (i < m) {
      d.reset()
      var j = i
      while (j < i + k) {
        if (j > i) d.update(space, 0, 1)
        d.update(bytes, offs(2 * j), offs(2 * j + 1) - offs(2 * j))
        j += 1
      }
      val h = digest48(d)
      if (seen == null || seen.add(h)) buf += h
      i += 1
    }
    new GenericArrayData(buf.toArray)
  }

  // --- single-pass repetition profile --------------------------------------

  @inline private def sameSlice(
      bytes: Array[Byte], s1: Int, e1: Int, s2: Int, e2: Int): Boolean = {
    if (e1 - s1 != e2 - s2) return false
    var i = 0
    val len = e1 - s1
    while (i < len) {
      if (bytes(s1 + i) != bytes(s2 + i)) return false
      i += 1
    }
    true
  }

  /** struct(n_tokens, max_token_run, top_bigram_n) in ONE pass over the
    * token offsets: longest run of consecutive identical tokens (byte-slice
    * compare, no token materialization) and the count of the most frequent
    * word bigram (exact-string keys — the same equivalence the
    * array_sort-then-longest-run form computes, without the O(n log n)
    * sort or the per-element interpreted fold). Bigram keys are the
    * space-joined pair, which is injective over token pairs because tokens
    * never contain ASCII whitespace. */
  def repetitionProfile(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val offs = tokenOffsets(bytes)
    val n = offs.length / 2
    var best = 0L
    var run = 0L
    var t = 0
    while (t < n) {
      if (t > 0 && sameSlice(bytes,
        offs(2 * t - 2), offs(2 * t - 1), offs(2 * t), offs(2 * t + 1)))
        run += 1
      else run = 1L
      if (run > best) best = run
      t += 1
    }
    var top = 0L
    if (n >= 2) {
      val counts = new java.util.HashMap[UTF8String, Array[Long]](n * 2)
      var i = 0
      while (i < n - 1) {
        val l1 = offs(2 * i + 1) - offs(2 * i)
        val l2 = offs(2 * i + 3) - offs(2 * i + 2)
        val bg = new Array[Byte](l1 + 1 + l2)
        System.arraycopy(bytes, offs(2 * i), bg, 0, l1)
        bg(l1) = 0x20
        System.arraycopy(bytes, offs(2 * i + 2), bg, l1 + 1, l2)
        val cell = counts.computeIfAbsent(
          UTF8String.fromBytes(bg), _ => new Array[Long](1))
        cell(0) += 1
        if (cell(0) > top) top = cell(0)
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](n.toLong, best, top))
  }

  val repetitionType: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("max_token_run", LongType, nullable = false),
    StructField("top_bigram_n", LongType, nullable = false)))

  // --- single-pass token/quality profile -----------------------------------

  /** Stopword lists (must mirror graft.text.TextStats.stopwords). */
  private val stopwordSets: Array[java.util.HashSet[UTF8String]] = Array(
    Seq("the", "a", "of", "and", "to"),
    Seq("el", "la", "de", "los", "que"),
    Seq("le", "les", "des", "et", "une"),
    Seq("der", "die", "das", "und", "ist")
  ).map { ws =>
    val s = new java.util.HashSet[UTF8String]()
    ws.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  /** Fast-path length gate for the per-token hash probe — DERIVED from the
    * lists so adding a longer stopword can never silently stop counting it
    * (a hardcoded 3 would have dropped e.g. 'dans'/'dass' without any test
    * failing on the old lists). */
  private val maxStopwordBytes: Int = {
    import scala.jdk.CollectionConverters._
    stopwordSets.iterator.flatMap(_.asScala).map(_.numBytes()).max
  }

  @inline private def isAsciiLetter(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  @inline private def isAsciiDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  /** struct(n_tokens, n_distinct_tokens, n_subwords, c_en, c_es, c_fr, c_de)
    * in one pass. n_subwords counts Java-regex
    * `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` matches over the ORIGINAL text (one
    * per ASCII letter run / digit run / other non-whitespace code point). */
  def profile(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    // subwords: scan untrimmed bytes
    var sub = 0L
    var i = 0
    val len = bytes.length
    while (i < len) {
      val b = bytes(i)
      if (isAsciiLetter(b)) {
        sub += 1; i += 1
        while (i < len && isAsciiLetter(bytes(i))) i += 1
      } else if (isAsciiDigit(b)) {
        sub += 1; i += 1
        while (i < len && isAsciiDigit(bytes(i))) i += 1
      } else if ((b & 0x80) == 0) {
        if (!isWs(b)) sub += 1
        i += 1
      } else {
        // one non-ASCII code point = one [^A-Za-z0-9\s] match; skip its
        // continuation bytes (0b10xxxxxx)
        sub += 1; i += 1
        while (i < len && (bytes(i) & 0xc0) == 0x80) i += 1
      }
    }
    // tokens
    val offs = tokenOffsets(bytes)
    val n = offs.length / 2
    val distinct = new java.util.HashSet[UTF8String](n * 2)
    val sw = new Array[Long](4)
    var t = 0
    while (t < n) {
      val off = offs(2 * t)
      val tl = offs(2 * t + 1) - off
      val tok = UTF8String.fromBytes(bytes, off, tl)
      distinct.add(tok)
      if (tl <= maxStopwordBytes) {
        val lower = tok.toLowerCase
        var l = 0
        while (l < 4) {
          if (stopwordSets(l).contains(lower)) sw(l) += 1
          l += 1
        }
      }
      t += 1
    }
    new GenericInternalRow(Array[Any](
      n.toLong, distinct.size.toLong, sub, sw(0), sw(1), sw(2), sw(3)))
  }

  val profileType: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct_tokens", LongType, nullable = false),
    StructField("n_subwords", LongType, nullable = false),
    StructField("c_en", LongType, nullable = false),
    StructField("c_es", LongType, nullable = false),
    StructField("c_fr", LongType, nullable = false),
    StructField("c_de", LongType, nullable = false)))
}

private[functions] trait StringInputExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs STRING input, got ${child.dataType.sql}")
  protected final def algebraCall(
      ctx: CodegenContext, ev: ExprCode,
      call: (String, String) => String): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val alg =
        TextTokenAlgebra.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = ${call(alg, s)};"
    })
}

/** md5-48 of each whitespace token of a STRING — fused native form of
  * `transform(split(trim(text), "\\s+"), md5Hash48)`. */
case class TokenHash48(child: Expression) extends StringInputExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextTokenAlgebra.tokenHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    algebraCall(ctx, ev, (alg, s) => s"$alg.tokenHashes($s)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "token_hash48"
}

/** md5-48 of each word k-gram shingle — fused native form of
  * `transform([array_distinct](wordShingles(text, k)), md5Hash48)`. */
case class ShingleHash48(child: Expression, k: Int, distinct: Boolean)
    extends StringInputExpression {
  require(k > 0, "shingle size must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextTokenAlgebra.shingleHashes(input.asInstanceOf[UTF8String], k, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    algebraCall(ctx, ev, (alg, s) => s"$alg.shingleHashes($s, $k, $distinct)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "shingle_hash48"
}

/** One-pass token/quality statistics struct (see
  * [[TextTokenAlgebra.profile]]) — fused native form of the five HOF
  * token-stat columns (token count, distinct count, subword count, per-
  * language stopword hits). */
case class TextProfile(child: Expression) extends StringInputExpression {
  override def dataType: DataType = TextTokenAlgebra.profileType
  override def nullSafeEval(input: Any): Any =
    TextTokenAlgebra.profile(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    algebraCall(ctx, ev, (alg, s) => s"$alg.profile($s)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "text_profile"
}

/** One-pass repetition-signal struct (see
  * [[TextTokenAlgebra.repetitionProfile]]) — fused native form of the
  * interpreted maxRunLength folds over tokens and sorted bigram arrays. */
case class RepetitionProfile(child: Expression) extends StringInputExpression {
  override def dataType: DataType = TextTokenAlgebra.repetitionType
  override def nullSafeEval(input: Any): Any =
    TextTokenAlgebra.repetitionProfile(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    algebraCall(ctx, ev, (alg, s) => s"$alg.repetitionProfile($s)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "repetition_profile"
}

object TextTokenExpressions {
  def tokenHash48(text: Column): Column =
    ColumnBridge.toColumn(TokenHash48(ColumnBridge.toExpression(text)))
  def repetitionProfile(text: Column): Column =
    ColumnBridge.toColumn(RepetitionProfile(ColumnBridge.toExpression(text)))
  def shingleHash48(text: Column, k: Int, distinct: Boolean): Column =
    ColumnBridge.toColumn(
      ShingleHash48(ColumnBridge.toExpression(text), k, distinct))
  def textProfile(text: Column): Column =
    ColumnBridge.toColumn(TextProfile(ColumnBridge.toExpression(text)))
}
