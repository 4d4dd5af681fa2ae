package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Native Catalyst expression: bucketed byte-value histogram of a binary
  * column — the hot-path primitive for binary/multimodal feature extraction
  * (a Scala UDF here would box every byte array and fall out of codegen;
  * SURVEY.md §7.3's "custom Expression beats UDF" rule).
  *
  * Output: array<long> of length `buckets`, counts of bytes by value range
  * (bucket = unsignedByte * buckets / 256). Implements `doGenCode`, so it
  * participates in whole-stage codegen.
  */
case class ByteHistogram(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets > 0 && buckets <= 256, "buckets must be in 1..256")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"byte_histogram needs BINARY input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val hist = new Array[Long](buckets)
    var i = 0
    while (i < bytes.length) {
      hist(((bytes(i) & 0xff) * buckets) >>> 8) += 1L
      i += 1
    }
    new GenericArrayData(hist)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytesVar => {
      val hist = ctx.freshName("hist")
      val i = ctx.freshName("i")
      s"""
         |long[] $hist = new long[$buckets];
         |for (int $i = 0; $i < $bytesVar.length; $i++) {
         |  $hist[(($bytesVar[$i] & 0xff) * $buckets) >>> 8] += 1L;
         |}
         |${ev.value} = new ${classOf[GenericArrayData].getName}($hist);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : ByteHistogram = copy(child = newChild)

  override def prettyName: String = "byte_histogram"
}

object ByteHistogram {
  /** Column API: `byte_histogram(content, 16)`. */
  def byteHistogram(c: Column, buckets: Int): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.toColumn(
      ByteHistogram(
        org.apache.spark.sql.graftshim.ColumnBridge.toExpression(c), buckets))

  /** Optional SQL registration: `SELECT byte_histogram(content, 16)`.
    * The bucket count must be a positive integer LITERAL — validated here
    * so a column/non-foldable/null argument gets a clear analysis-time
    * message instead of an Unevaluable crash or NPE from a blind eval. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "byte_histogram",
      exprs => {
        require(exprs.length == 2,
          "byte_histogram(content, buckets) takes exactly 2 arguments")
        val b = exprs(1)
        if (!b.foldable) throw new IllegalArgumentException(
          "byte_histogram: buckets must be a positive integer literal, " +
            s"got non-constant expression ${b.sql}")
        b.eval() match {
          case n: Number if n.intValue() > 0 =>
            ByteHistogram(exprs.head, n.intValue())
          case other => throw new IllegalArgumentException(
            "byte_histogram: buckets must be a positive integer literal, " +
              s"got $other")
        }
      },
      "built-in")
}
