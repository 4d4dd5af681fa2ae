package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** ADD COLUMN ... DEFAULT (initial-default semantics): pre-add rows read
  * the default, post-add stored NULLs stay NULL, the annotation survives
  * data commits and renames, drop+re-add starts clean, both DSv2 reader
  * modes fill it, the SQL surface (ALTER/INSERT) resolves it, and
  * non-constant/NULL defaults fail at ALTER time. */
class ColumnDefaultsSpec extends SparkSpec {
  import spark.implicits._

  test("pre-add rows read the default; post-add nulls stay null") {
    val dir = tmpDir("coldef") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id")))
    t.create((1L to 20L).map(i => (i, s"n$i")).toDF("id", "name"))
    val v = t.addColumn("score", IntegerType, Some("42"))
    assert(v == 2 && t.manifest(2).dataChange == false)
    // every pre-add row reads the default — zero data rewritten
    assert(t.read().select("score").as[Int].collect().forall(_ == 42))
    // post-add batch: explicit NULL stays NULL, explicit value stays
    t.upsert(Seq((1L, "n1", None: Option[Int]), (21L, "n21", Some(7)))
      .toDF("id", "name", "score"))
    val got = t.read().select($"id", $"score").as[(Long, Option[Int])]
      .collect().toMap
    assert(got(1L).isEmpty && got(21L).contains(7) && got(2L).contains(42))
    // a rewrite (compaction) materializes the default physically — the
    // logical content is unchanged
    t.compact(smallBytes = Long.MaxValue)
    val after = t.read().select($"id", $"score").as[(Long, Option[Int])]
      .collect().toMap
    assert(after == got)
    // time travel below the add sees the pre-add schema
    assert(!t.readVersion(1).columns.contains("score"))
  }

  test("default survives data commits + rename; drop+re-add starts clean") {
    val dir = tmpDir("coldef") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id")))
    t.create(Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    t.addColumn("score", IntegerType, Some("9"))
    // a plain upsert commits a df-derived schema (no field metadata) —
    // the manifest must re-attach the default annotation
    t.upsert(Seq((3L, "c", 1)).toDF("id", "name", "score"))
    assert(ColumnDefaults.existsSql(
      CowTable.structFromJson(t.manifest(t.currentVersion).schemaJson)
        .apply("score")).contains("9"))
    assert(t.read().filter($"id" === 1L).select("score").as[Int].head == 9)
    // rename keeps the default riding the field
    t.renameColumn("score", "points")
    assert(t.read().filter($"id" === 2L).select("points").as[Int].head == 9)
    // drop + re-add WITHOUT default: clean slate — neither the default nor
    // the old bytes resurrect
    t.dropColumn("points")
    t.addColumn("points", IntegerType, None)
    assert(t.read().select("points").as[Option[Int]].collect()
      .forall(_.isEmpty))
  }

  test("DSv2 readers fill the default: columnar and row (DV) modes") {
    val base = tmpDir("coldef")
    val t = CowTable(spark, base + "/c", TableConfig("c", Seq("id")))
    t.create((1L to 10L).map(i => (i, s"n$i")).toDF("id", "name"))
    t.addColumn("w", DoubleType, Some("2.5"))
    val df = spark.read.format("graft").load(base + "/c")
    assert(df.select("w").as[Double].collect().forall(_ == 2.5))
    // deletion-vectored files force the ROW reader — same fill
    val d = CowTable(spark, base + "/r", TableConfig("r", Seq("id"),
      changeDataFeed = true, deletionVectors = true))
    d.create((1L to 10L).map(i => (i, s"n$i")).toDF("id", "name"))
    d.delete(Seq(Tuple1(3L)).toDF("id"))
    d.addColumn("w", DoubleType, Some("1.25"))
    val rdf = spark.read.format("graft").load(base + "/r")
    assert(rdf.count() == 9)
    assert(rdf.select("w").as[Double].collect().forall(_ == 1.25))
  }

  test("SQL surface: ALTER ADD DEFAULT + INSERT default resolution") {
    val lake = tmpDir("coldefsql")
    val t = CowTable(spark, lake + "/t", TableConfig("t", Seq("id")))
    t.create(Seq((1L, "a")).toDF("id", "name"))
    LakeRegistry.register(lake, t.config, "t")
    val sess = spark.newSession()
    sess.conf.set("spark.sql.catalog.lake", "graft.sources.GraftCatalog")
    sess.conf.set("spark.sql.catalog.lake.warehouse", lake)
    sess.sql("ALTER TABLE lake.default.t ADD COLUMN bonus INT DEFAULT 5")
    assert(sess.sql("SELECT bonus FROM lake.default.t")
      .as(org.apache.spark.sql.Encoders.scalaInt).head() == 5)
    // INSERT omitting the column fills CURRENT_DEFAULT (capability-gated)
    sess.sql("INSERT INTO lake.default.t (id, name) VALUES (2, 'b')")
    // the DEFAULT keyword and an explicit NULL behave as declared
    sess.sql("INSERT INTO lake.default.t VALUES (3, 'c', DEFAULT)")
    sess.sql("INSERT INTO lake.default.t VALUES (4, 'd', NULL)")
    val got = sess.sql("SELECT id, bonus FROM lake.default.t")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(got == Map(1L -> Some(5), 2L -> Some(5), 3L -> Some(5),
      4L -> None))
  }

  test("non-constant, NULL, and uncastable defaults fail at ALTER time") {
    val dir = tmpDir("coldef") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id")))
    t.create(Seq((1L, "a")).toDF("id", "name"))
    val e1 = intercept[Exception](
      t.addColumn("x", IntegerType, Some("CAST(rand() * 10 AS INT)")))
    assert(e1.getMessage.contains("constant-foldable"))
    val e2 = intercept[Exception](
      t.addColumn("x", IntegerType, Some("NULL")))
    assert(e2.getMessage.contains("evaluates to NULL"))
    intercept[Exception](
      t.addColumn("x", IntegerType, Some("id + 1"))) // column reference
    intercept[Exception](
      t.addColumn("x", IntegerType, Some("'abc'"))) // ANSI cast failure
    assert(t.currentVersion == 1) // nothing committed by any failure
  }

  test("constant-FOLDABLE expression defaults: arithmetic folds; " +
      "current_date() freezes at ALTER time") {
    val dir = tmpDir("coldef") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id")))
    t.create(Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    // arithmetic over literals folds to its value
    t.addColumn("score", IntegerType, Some("40 + CAST(2 AS INT)"))
    assert(t.read().select("score").as[Int].collect().forall(_ == 42))
    // current_date() is query-constant: accepted, and EXISTS_DEFAULT holds
    // the FROZEN fold (a literal date), not the expression — pre-add rows
    // keep reading the ALTER-day value forever
    t.addColumn("ingested", org.apache.spark.sql.types.DateType,
      Some("current_date()"))
    val frozen = ColumnDefaults.existsSql(
      CowTable.structFromJson(t.manifest(t.currentVersion).schemaJson)
        .apply("ingested")).get
    assert(frozen.contains("DATE '"), s"must freeze to a literal: $frozen")
    val today = java.time.LocalDate.now()
    assert(t.read().select("ingested")
      .as[java.sql.Date].collect()
      .forall(d => math.abs(java.time.temporal.ChronoUnit.DAYS.between(
        d.toLocalDate, today)) <= 1)) // ALTER-day value (midnight-safe)
  }
}
