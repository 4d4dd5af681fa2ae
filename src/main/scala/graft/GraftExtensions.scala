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

  private def intArg(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

  override def apply(ext: SparkSessionExtensions): Unit = {
    def register(
        name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))

    register("byte_histogram",
      es => ByteHistogram(es.head, intArg(es(1))))
    register("affine_minhash_sig",
      es => AffineMinHashSig(es.head, intArg(es(1))))
    register("simhash48", es => SimHash48(es.head))
    register("winnow_mins", es => WinnowMins(es.head, intArg(es(1))))
    register("dot_long", es => DotProductLong(es.head, es(1)))
    register("rolling_hash_windows",
      es => RollingHashWindows(es.head, intArg(es(1)), intArg(es(2))))
  }
}
