package graft.sources

import graft.SparkSpec
import graft.storage.{CowTable, TableConfig}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

/** Parquet ROW-GROUP skipping inside the columnar reader: pushed filters
  * convert per file against the footer schema ([[ParquetRowGroupFilter]])
  * and whole row groups a selective predicate can't reach are never
  * decoded. Pruning-only — every filter stays residual, so conversion
  * declines must only ever read MORE. */
class RowGroupFilterSpec extends SparkSpec {
  import spark.implicits._

  /** A single multi-row-group parquet file of ids 1..4000 (tiny block
    * size ⇒ several groups, each covering a narrow clustered id range). */
  private def multiGroupFile(dir: String): (String, Int) = {
    (1L to 4000L).map(i => (i, s"pad-$i-" + "x" * 64)).toDF("id", "pad")
      .orderBy("id").coalesce(1)
      .write.option("parquet.block.size", "8192")
      .option("parquet.page.size", "2048")
      .parquet(dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    val groups = {
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f),
        new org.apache.hadoop.conf.Configuration()))
      try r.getFooter.getBlocks.size finally r.close()
    }
    (f, groups)
  }

  private def readCount(file: String,
      filters: Seq[Filter]): Long = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("pad",
        org.apache.spark.sql.types.StringType)))
    val r = new GraftColumnarPartitionReader(file, schema, Map.empty,
      capacity = 512, filters = filters, rowGroupFilterMinBytes = 0L)
    try {
      var n = 0L
      while (r.next()) n += r.get().numRows()
      n
    } finally r.close()
  }

  test("a clustered point predicate reads one row group, not the file") {
    val dir = tmpDir("rgf") + "/p"
    val (file, groups) = multiGroupFile(dir)
    assert(groups >= 4, s"fixture needs several row groups, got $groups")
    val all = readCount(file, Nil)
    assert(all == 4000L)
    // group-level granularity is observable at the READER level (no
    // residual filter here): surviving groups return ALL their rows
    val hit = readCount(file, Seq(EqualTo("id", 2000L)))
    assert(hit >= 1L && hit < all / 2,
      s"point lookup must skip most of $groups groups, read $hit/$all")
    val range = readCount(file,
      Seq(GreaterThanOrEqual("id", 3900L)))
    assert(range >= 101L && range < all / 2, s"range read $range/$all")
    // a predicate nothing satisfies skips every group
    assert(readCount(file, Seq(GreaterThan("id", 99999L))) == 0L)
  }

  test("conversion declines safely: type mismatch, Or-partial, unknown col") {
    val dir = tmpDir("rgf") + "/d"
    val (file, _) = multiGroupFile(dir)
    // INT64 column under an Integer literal: declined ⇒ full read
    assert(readCount(file,
      Seq(EqualTo("id", java.lang.Integer.valueOf(1)))) == 4000L)
    // unknown column: declined
    assert(readCount(file, Seq(EqualTo("nope", 1L))) == 4000L)
    // Or with one unconvertible side: the whole Or must decline
    assert(readCount(file,
      Seq(Or(EqualTo("id", 1L), EqualTo("nope", 1L)))) == 4000L)
    // And keeps the convertible side (superset semantics)
    val and = readCount(file,
      Seq(And(EqualTo("id", 2000L), EqualTo("nope", 1L))))
    assert(and >= 1L && and < 2000L, s"And partial read $and")
    // string equality on the BINARY/string column converts
    val s = readCount(file, Seq(EqualTo("pad", "pad-1-" + "x" * 64)))
    assert(s >= 1L && s < 4000L, s"string eq read $s")
  }

  test("widening interplay: a narrower-era file declines the wide predicate") {
    import org.apache.parquet.schema.MessageTypeParser.parseMessageType
    val f32 = parseMessageType("message m { optional int32 n; }")
    val f64 = parseMessageType("message m { optional int64 n; }")
    // post-widen BIGINT predicate: the INT32-era file must DECLINE (parquet
    // would throw on the type mismatch; pruning stays per-file optional),
    // the INT64-era file converts
    val pred = Seq(EqualTo("n", java.lang.Long.valueOf(5L)))
    assert(ParquetRowGroupFilter.predicateFor(f32, pred).isEmpty)
    assert(ParquetRowGroupFilter.predicateFor(f64, pred).isDefined)
    // decimal ANNOTATION on the same physical type also declines an
    // integer literal (an unscaled decimal int is not the long's value)
    val fdec = parseMessageType(
      "message m { optional int64 n (DECIMAL(12,2)); }")
    assert(ParquetRowGroupFilter.predicateFor(fdec, pred).isEmpty)
    // logical→physical name mapping routes the lookup
    val fphys = parseMessageType("message m { optional int64 col_7x; }")
    assert(ParquetRowGroupFilter.predicateFor(
      fphys, pred, Map("n" -> "col_7x")).isDefined)
    assert(ParquetRowGroupFilter.predicateFor(fphys, pred).isEmpty)
  }

  test("floating-point corners: NaN and signed zero never mis-skip") {
    val dir = tmpDir("rgf") + "/fp"
    // one row group per tricky population, written as separate files then
    // read through the graft scan with the gate lowered via direct reader
    val rows = Seq(
      (1L, -0.0), (2L, 0.0), (3L, Double.NaN), (4L, -5.5), (5L, 5.5))
    val t = CowTable(spark, dir,
      TableConfig("t", Seq("id"), clusterByKey = true))
    t.create(rows.toDF("id", "x").repartitionByRange(3, $"id"))
    val preds = Seq($"x" === 0.0, $"x" === -0.0, $"x" > 0.0, $"x" < 0.0,
      $"x" >= 0.0, $"x".isNaN, $"x" === 5.5)
    for (p <- preds) {
      val cols = spark.read.format("graft").load(dir).filter(p)
        .select("id").as[Long].collect().toSet
      val rowsMode = spark.read.format("graft")
        .option("columnar", "false").load(dir).filter(p)
        .select("id").as[Long].collect().toSet
      assert(cols == rowsMode, s"FP divergence for $p: $cols vs $rowsMode")
    }
    // and at the reader level (gate lowered): eq(0.0) must keep the group
    // holding only -0.0 (SQL -0.0 == 0.0), NaN rows never vanish
    val file = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.DoubleType)))
    val total = file.map { f =>
      val r = new GraftColumnarPartitionReader(f.getAbsolutePath, schema,
        Map.empty, capacity = 64,
        filters = Seq(EqualTo("x", 0.0)), rowGroupFilterMinBytes = 0L)
      try { var n = 0L; while (r.next()) n += r.get().numRows(); n }
      finally r.close()
    }.sum
    // the groups holding -0.0 and +0.0 must BOTH survive stats filtering
    assert(total >= 2L, s"signed-zero group mis-skipped: read $total rows")
  }

  test("end-to-end results are identical with and without group skipping") {
    val dir = tmpDir("rgf") + "/t"
    val rnd = new scala.util.Random(7)
    val rows = (1L to 3000L).map { i =>
      (i, if (rnd.nextInt(10) == 0) null else s"v${rnd.nextInt(100)}",
        rnd.nextDouble() * 100 - 50,
        new java.sql.Timestamp(1700000000000L + i * 60000L))
    }
    val t = CowTable(spark, dir,
      TableConfig("t", Seq("id"), clusterByKey = true))
    t.create(rows.toDF("id", "v", "x", "ts").repartitionByRange(3, $"id"))
    val preds = Seq(
      $"id" >= 1200L && $"id" < 1300L,
      $"v" === "v42",
      $"x" > 0.0,
      $"id" === 77L || $"v" === "v7",
      $"v".isNull && $"id" <= 500L,
      $"ts" >= new java.sql.Timestamp(1700000000000L + 2000L * 60000L),
      $"ts" === new java.sql.Timestamp(1700000000000L + 123L * 60000L))
    for (p <- preds) {
      val cols = spark.read.format("graft").load(dir).filter(p)
        .collect().map(_.toString).sorted.toSeq
      val rowsMode = spark.read.format("graft")
        .option("columnar", "false").load(dir).filter(p)
        .collect().map(_.toString).sorted.toSeq
      assert(cols == rowsMode, s"divergence for $p")
    }
  }

  // ---- ROW-MODE row-group skipping (round 16) ----

  private def rowModeIds(file: String, filters: Seq[Filter],
      dv: Option[(String, String)] = None,
      withPos: Boolean = false): Seq[(Long, Long)] = {
    val base = Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType))
    val schema = org.apache.spark.sql.types.StructType(
      if (withPos) base :+ org.apache.spark.sql.types.StructField(
        GraftTable.PosColumnName, org.apache.spark.sql.types.LongType)
      else base)
    val r = new GraftPartitionReader(file, schema, Map.empty, dv = dv,
      filters = filters, rowGroupFilterMinBytes = 0L)
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      while (r.next()) {
        val row = r.get()
        out += ((row.getLong(0), if (withPos) row.getLong(1) else -1L))
      }
      out.toSeq
    } finally r.close()
  }

  test("row mode skips groups like the columnar reader (stats level)") {
    val dir = tmpDir("rgf") + "/rm"
    val (file, groups) = multiGroupFile(dir)
    assert(groups >= 4)
    // row mode applies the STATS filter level; the vectorized reader may
    // additionally dictionary-filter — so row mode reads a SUPERSET of the
    // columnar survivors, and both must actually skip on selective
    // predicates. Never fewer rows (that would be a wrong skip).
    for ((fs, selective) <- Seq[(Seq[Filter], Boolean)](
      (Seq(EqualTo("id", 2000L)), true),
      (Seq(GreaterThanOrEqual("id", 3900L)), true),
      (Seq(And(GreaterThan("id", 1000L), LessThan("id", 1200L))), true),
      (Seq(GreaterThan("id", 99999L)), true),
      (Nil, false))) {
      val viaRows = rowModeIds(file, fs).map(_._1)
      val viaCols = readCount(file, fs)
      assert(viaRows.size.toLong >= viaCols,
        s"row mode under-read for $fs: ${viaRows.size} < $viaCols")
      if (selective)
        assert(viaRows.size < 4000,
          s"row mode skipped nothing for $fs (${viaRows.size} rows)")
      else assert(viaRows.size == 4000)
    }
    // skipped groups don't shift positions: `_pos` is the GLOBAL parquet
    // row index even when earlier groups were skipped (file is ids 1..4000
    // in order, so pos == id - 1 exactly)
    val posed = rowModeIds(file, Seq(GreaterThanOrEqual("id", 3000L)),
      withPos = true)
    assert(posed.nonEmpty && posed.forall { case (id, pos) => pos == id - 1 },
      s"row positions drifted under skipping: ${posed.take(3)}")
  }

  test("row-group skipping composes with deletion vectors position-exactly") {
    val dir = tmpDir("rgf") + "/dv"
    val (file, groups) = multiGroupFile(dir)
    assert(groups >= 4)
    // hand-built sidecar: delete ids 1050..1060 (pos = id-1) by position
    val rel = "data.parquet" // reader matches the sidecar rows' path field
    val dvDir = tmpDir("rgf") + "/sidecar"
    (1050L to 1060L).map(id => (rel, id - 1)).toDF("path", "pos")
      .coalesce(1).write.parquet(dvDir)
    val got = rowModeIds(file,
      Seq(And(GreaterThanOrEqual("id", 1000L), LessThanOrEqual("id", 1100L))),
      dv = Some((dvDir, rel))).map(_._1).toSet
    // group skipping keeps whole surviving groups (superset of the range),
    // but the DELETED positions must be exactly ids 1050..1060 — a single
    // position drift under skipping would delete the wrong neighbors
    assert((1000L to 1100L).toSet.subsetOf(got ++ (1050L to 1060L)))
    assert((1050L to 1060L).forall(!got.contains(_)),
      s"deleted ids resurfaced: ${got.filter(i => i >= 1050 && i <= 1060)}")
    assert(got.contains(1049L) && got.contains(1061L),
      "neighbors of the deleted range must survive (no position drift)")
  }
}
