package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions install the native functions into a session's SQL surface") {
    // boot the shared session first, then force a NEW SparkSession (same
    // SparkContext) — getOrCreate returns the active session otherwise and
    // silently ignores withExtensions
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import s.implicits._
      Seq((1L, "hello world", Seq(7L, 7L, 9L)))
        .toDF("id", "text", "hs").createOrReplaceTempView("ext_t")
      val row = s.sql(
        """SELECT
          |  byte_histogram(CAST(text AS BINARY), 16) AS bh,
          |  simhash48(hs) AS sh,
          |  affine_minhash_sig(hs, 4) AS sig,
          |  dot_long(hs, hs) AS d,
          |  winnow_mins(hs, 2) AS wm,
          |  size(rolling_hash_windows(text, 4, 2)) AS nrh
          |FROM ext_t
          |""".stripMargin).head()
      assert(row.getSeq[Long](row.fieldIndex("bh")).sum == 11L)
      assert(row.getAs[Long]("d") == 7L * 7 + 7L * 7 + 9L * 9)
      assert(row.getSeq[Long](row.fieldIndex("sig")).length == 4)
      assert(row.getSeq[Long](row.fieldIndex("wm")).nonEmpty)
      assert(row.getAs[Int]("nrh") > 0)
      // simhash of identical-bit inputs: bits of 7 and 9 majority-voted
      assert(row.getAs[Long]("sh") >= 0L)
      // bad calls are proper analysis errors, not builder crashes:
      // wrong arity, non-literal int arg, and out-of-Int-range Long literal
      intercept[org.apache.spark.sql.AnalysisException](
        s.sql("SELECT simhash48() FROM ext_t").head())
      intercept[org.apache.spark.sql.AnalysisException](
        s.sql("SELECT winnow_mins(hs, id) FROM ext_t").head())
      intercept[org.apache.spark.sql.AnalysisException](
        s.sql("SELECT rolling_hash_windows(text, 4294967328, 8) FROM ext_t")
          .head())
    } finally {
      // restore the shared session as default for other suites
      assert(base.sparkContext == s.sparkContext)
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
