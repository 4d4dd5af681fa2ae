package graft

import graft.functions.{AffineMinHashSig, ByteHistogram, DotProductLong, RollingHashWindows, SimHash48, WinnowMins}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension hook — the engine's analog of the reference's
  * `spark.sql.extensions` injection (Hudi/Iceberg/Delta all install one,
  * e.g. src/hudi/hudi-cdc-load.py:43-44). Registers the native expressions
  * for SQL use:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)        // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * // then:
  * spark.sql("SELECT simhash48(hs), byte_histogram(content, 16) FROM t")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Proper analysis errors for bad calls (wrong arity / non-literal int
    * args) instead of opaque builder exceptions. Raised as a USER error
    * class (INVALID_PARAMETER_VALUE), not INTERNAL_ERROR — a typo in a SQL
    * call is bad input, and callers must be able to tell it apart from an
    * engine bug. */
  private def require(
      cond: Boolean, name: String, signature: String): Unit =
    if (!cond) throw new org.apache.spark.sql.AnalysisException(
      errorClass = "INVALID_PARAMETER_VALUE.PATTERN",
      messageParameters = Map(
        "parameter" -> "arguments",
        "functionName" -> s"`$name`",
        "value" -> s"expected $name($signature)"))

  private def arity(
      es: Seq[Expression], n: Int, name: String, sig: String): Unit =
    require(es.length == n, name, sig)

  private def intArg(e: Expression, name: String, sig: String): Int = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    require(e.foldable &&
      Seq(ByteType, ShortType, IntegerType, LongType).contains(e.dataType),
      name, sig)
    val v = e.eval().asInstanceOf[Number].longValue()
    // no silent Int truncation — a LongType literal out of Int range would
    // otherwise run with a wrapped value instead of erroring
    require(v >= Int.MinValue && v <= Int.MaxValue, name, sig)
    v.toInt
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def register(
        name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))

    register("byte_histogram", { es =>
      val sig = "BINARY, INT literal"
      arity(es, 2, "byte_histogram", sig)
      ByteHistogram(es.head, intArg(es(1), "byte_histogram", sig))
    })
    register("affine_minhash_sig", { es =>
      val sig = "ARRAY<BIGINT>, INT literal"
      arity(es, 2, "affine_minhash_sig", sig)
      AffineMinHashSig(es.head, intArg(es(1), "affine_minhash_sig", sig))
    })
    register("simhash48", { es =>
      arity(es, 1, "simhash48", "ARRAY<BIGINT>")
      SimHash48(es.head)
    })
    register("winnow_mins", { es =>
      val sig = "ARRAY<BIGINT>, INT literal"
      arity(es, 2, "winnow_mins", sig)
      WinnowMins(es.head, intArg(es(1), "winnow_mins", sig))
    })
    register("dot_long", { es =>
      arity(es, 2, "dot_long", "ARRAY<BIGINT>, ARRAY<BIGINT>")
      DotProductLong(es.head, es(1))
    })
    register("rolling_hash_windows", { es =>
      val sig = "STRING, INT literal, INT literal"
      arity(es, 3, "rolling_hash_windows", sig)
      RollingHashWindows(es.head,
        intArg(es(1), "rolling_hash_windows", sig),
        intArg(es(2), "rolling_hash_windows", sig))
    })
  }
}
