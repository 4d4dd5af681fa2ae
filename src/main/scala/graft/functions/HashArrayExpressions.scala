package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hash-array hot paths of the dedup /
  * similarity operators.
  *
  * Why native and not higher-order `functions._` compositions: HOF lambdas
  * (`transform`/`aggregate`) evaluate interpreted — and worse, Catalyst's
  * CollapseProject can inline the token-hash array INTO an enclosing
  * transform, re-evaluating N md5 calls per signature row (observed: a 64-
  * hash signature re-hashing every shingle 64×, ~10 min single-task at sf0.1).
  * A native expression takes the hash array as ONE child, evaluated once per
  * row, and runs a tight compiled loop: the same algebra at arithmetic cost.
  * Each implements doGenCode (whole-stage codegen) + an identical
  * interpreted eval.
  *
  * The algebra is bit-identical to the DuckDB oracle SQL in TextQueries (the
  * affine formula and bit math are unchanged — only the evaluation engine).
  */
private[graft] object HashArrayAlgebra {
  val P: Long = 2147483647L // Mersenne prime 2^31-1, the minhash modulus

  def minhashSig(hs: ArrayData, numHashes: Int): GenericArrayData = {
    val n = hs.numElements()
    val sig = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val a = 2L * i + 1L
      val b = i.toLong * i + 1L
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (a * (hs.getLong(j) % P) + b) % P
        if (v < best) best = v
        j += 1
      }
      sig(i) = best
      i += 1
    }
    new GenericArrayData(sig)
  }

  def simhash48(hs: ArrayData): Long = {
    val n = hs.numElements()
    val sums = new Array[Int](48)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var b = 0
      while (b < 48) {
        if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 48) {
      if (sums(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def winnowMins(hs: ArrayData, w: Int): GenericArrayData = {
    val n = hs.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= n - w) {
      var best = Long.MaxValue
      var j = i
      while (j < i + w) {
        val v = hs.getLong(j)
        if (v < best) best = v
        j += 1
      }
      seen.add(best)
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    // a silent min-length truncation would undervalue the cosine of a
    // corrupt/mismatched-dimension pair instead of surfacing it — the
    // "exact" similarity paths must fail loud on bad inputs
    if (b.numElements() != n) throw new IllegalArgumentException(
      s"dot_long: embedding dimensions differ (${n} vs ${b.numElements()})" +
        " — mixed-dimension corpus or mis-exported query vectors")
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  /** Polynomial rolling hash (Rabin–Karp) windows over a string's UTF-8
    * bytes: hash of every `stride`-th window of `w` bytes, O(n) total via
    * the rolling update. Base/modulus sized so products stay in int64. */
  def rollingWindows(
      s: org.apache.spark.unsafe.types.UTF8String,
      w: Int, stride: Int): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < w) return new GenericArrayData(Array.empty[Long])
    val M = 1000000007L
    val B = 131L
    var pow = 1L // B^(w-1) mod M
    var i = 0
    while (i < w - 1) { pow = pow * B % M; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = (h * B + (bytes(i) & 0xff)) % M; i += 1 }
    val out = new scala.collection.mutable.ArrayBuffer[Long]((n - w) / stride + 1)
    var start = 0
    if (start % stride == 0) out += h
    while (start + w < n) {
      h = (h - (bytes(start) & 0xff) * pow % M + M) % M
      h = (h * B + (bytes(start + w) & 0xff)) % M
      start += 1
      if (start % stride == 0) out += h
    }
    new GenericArrayData(out.toArray)
  }

  private[functions] val longArray = ArrayType(LongType, containsNull = false)

  private[functions] def checkLongArray(
      name: String, dt: DataType*): TypeCheckResult =
    if (dt.forall {
      case ArrayType(LongType, _) => true
      case _ => false
    }) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$name needs ARRAY<BIGINT> input")
}

/** sig[i] = min over h of ((2i+1)·(h mod P) + i²+1) mod P, i < numHashes. */
case class AffineMinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  import HashArrayAlgebra._
  override def dataType: DataType = longArray
  override def checkInputDataTypes(): TypeCheckResult =
    checkLongArray(prettyName, child.dataType)
  override def nullSafeEval(input: Any): Any =
    minhashSig(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val alg = HashArrayAlgebra.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $alg.minhashSig($hs, $numHashes);"
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "affine_minhash_sig"
}

/** 48-bit SimHash of a token-hash array (±1 frequency-weighted bit votes). */
case class SimHash48(child: Expression) extends UnaryExpression {
  import HashArrayAlgebra._
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    checkLongArray(prettyName, child.dataType)
  override def nullSafeEval(input: Any): Any =
    simhash48(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val alg = HashArrayAlgebra.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $alg.simhash48($hs);"
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "simhash48"
}

/** Distinct sliding-window minima (winnowing fingerprints), window w. */
case class WinnowMins(child: Expression, w: Int) extends UnaryExpression {
  import HashArrayAlgebra._
  override def dataType: DataType = longArray
  override def checkInputDataTypes(): TypeCheckResult =
    checkLongArray(prettyName, child.dataType)
  override def nullSafeEval(input: Any): Any =
    winnowMins(input.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val alg = HashArrayAlgebra.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $alg.winnowMins($hs, $w);"
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "winnow_mins"
}

/** Exact int64 dot product of two ARRAY<BIGINT> columns (quantized vectors). */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {
  import HashArrayAlgebra._
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    checkLongArray(prettyName, left.dataType, right.dataType)
  override def nullSafeEval(a: Any, b: Any): Any =
    dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val alg = HashArrayAlgebra.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $alg.dotLong($a, $b);"
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_long"
}

/** Rolling-hash (Rabin–Karp) window hashes of a STRING column — the
  * document-fingerprinting primitive over raw characters (vs the word-level
  * winnowing path): O(n) per document, codegen'd. */
case class RollingHashWindows(child: Expression, window: Int, stride: Int)
    extends UnaryExpression {
  require(window > 0 && stride > 0, "window and stride must be positive")
  override def dataType: DataType = HashArrayAlgebra.longArray
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs STRING input, got ${child.dataType.sql}")
  override def nullSafeEval(input: Any): Any =
    HashArrayAlgebra.rollingWindows(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      window, stride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val alg = HashArrayAlgebra.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $alg.rollingWindows($s, $window, $stride);"
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "rolling_hash_windows"
}

object HashArrayExpressions {
  def affineMinhashSig(hashes: Column, numHashes: Int): Column =
    ColumnBridge.toColumn(
      AffineMinHashSig(ColumnBridge.toExpression(hashes), numHashes))
  def simhash48(hashes: Column): Column =
    ColumnBridge.toColumn(SimHash48(ColumnBridge.toExpression(hashes)))
  def winnowMins(hashes: Column, w: Int): Column =
    ColumnBridge.toColumn(WinnowMins(ColumnBridge.toExpression(hashes), w))
  def dotLong(a: Column, b: Column): Column =
    ColumnBridge.toColumn(
      DotProductLong(ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
  def rollingHashWindows(text: Column, window: Int, stride: Int): Column =
    ColumnBridge.toColumn(
      RollingHashWindows(ColumnBridge.toExpression(text), window, stride))
}
