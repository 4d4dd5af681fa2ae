package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CHECK constraints ([[TableConfig.checkConstraints]], Delta invariant
  * semantics: false OR NULL rejects) across the batch API and the DSv2
  * connector/SQL path, including manifest-durable inheritance. */
class CheckConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private def cfg = TableConfig("t", Seq("id"),
    checkConstraints = Seq("v >= 0", "id > 0"))

  test("create/upsert reject violating rows loudly, naming the constraint") {
    val dir = tmpDir("chk")
    val t = CowTable(spark, dir + "/t", cfg)
    val bad = intercept[IllegalArgumentException] {
      t.create(Seq((1L, 5.0), (2L, -1.0)).toDF("id", "v"))
    }
    assert(bad.getMessage.contains("v >= 0") &&
      !bad.getMessage.contains("id > 0"), bad.getMessage)
    assert(t.currentVersion == 0) // nothing committed

    t.create(Seq((1L, 5.0), (2L, 2.5)).toDF("id", "v"))
    val badUp = intercept[IllegalArgumentException] {
      t.upsert(Seq((0L, -3.0)).toDF("id", "v")) // violates BOTH
    }
    assert(badUp.getMessage.contains("v >= 0") &&
      badUp.getMessage.contains("id > 0"), badUp.getMessage)
    // table state untouched by the failed write
    assert(t.currentVersion == 1)
    assert(t.read().as[(Long, Double)].collect().toSet ==
      Set((1L, 5.0), (2L, 2.5)))
    // valid upsert still lands
    t.upsert(Seq((3L, 0.0)).toDF("id", "v"))
    assert(t.read().count() == 3)
  }

  test("NULL evaluates as a violation (Delta invariant semantics)") {
    val dir = tmpDir("chk")
    val t = CowTable(spark, dir + "/t",
      TableConfig("t", Seq("id"), checkConstraints = Seq("v IS NOT NULL")))
    intercept[IllegalArgumentException] {
      t.create(Seq((1L, Some(1.0)), (2L, None))
        .toDF("id", "v"))
    }
    // and a constraint whose own result is NULL (null >= 0) also rejects
    val t2 = CowTable(spark, dir + "/t2",
      TableConfig("t2", Seq("id"), checkConstraints = Seq("v >= 0")))
    intercept[IllegalArgumentException] {
      t2.create(Seq((1L, Some(1.0)), (2L, None)).toDF("id", "v"))
    }
  }

  test("SQL surface: OPTIONS-declared constraints bind the connector path") {
    val lake = tmpDir("chk")
    val sess = spark.newSession()
    sess.conf.set("spark.sql.catalog.lake", "graft.sources.GraftCatalog")
    sess.conf.set("spark.sql.catalog.lake.warehouse", lake)
    sess.sql("CREATE TABLE lake.default.c (id BIGINT, v DOUBLE) " +
      "OPTIONS (primaryKey 'id', checkConstraints 'v >= 0; id > 0')")
    sess.sql("INSERT INTO lake.default.c VALUES (1, 1.5), (2, 0.0)")
    val bad = intercept[Exception] {
      sess.sql("INSERT INTO lake.default.c VALUES (3, -9.0)")
    }
    assert(bad.getMessage.contains("v >= 0") ||
      Option(bad.getCause).exists(_.getMessage.contains("v >= 0")),
      bad.getMessage)
    // rejected insert committed nothing; written files are unreferenced
    assert(sess.table("lake.default.c").count() == 2)

    // a FRESH writer opening the table from its root alone inherits the
    // constraints from the manifest (durable table properties)
    val t = CowTable(spark, lake + "/c", TableConfig("c", Seq("id")))
    val inherited = CowTable.configAt(t.root, TableConfig("c", Seq("id")))
    assert(inherited.checkConstraints == Seq("v >= 0", "id > 0"))
    intercept[IllegalArgumentException] {
      CowTable(spark, lake + "/c", inherited)
        .upsert(Seq((4L, -1.0)).toDF("id", "v"))
    }

    // the row-level SQL path (UPDATE / MERGE rewrites) is bound too
    val badUpd = intercept[Exception] {
      sess.sql("UPDATE lake.default.c SET v = -5.0 WHERE id = 1")
    }
    assert(badUpd.getMessage.contains("v >= 0") ||
      Option(badUpd.getCause).exists(_.getMessage.contains("v >= 0")),
      badUpd.getMessage)
    assert(sess.table("lake.default.c").filter("v < 0").count() == 0)
    sess.sql("UPDATE lake.default.c SET v = 9.0 WHERE id = 1")
    assert(sess.table("lake.default.c").filter("v = 9.0").count() == 1)
  }

  test("cross-session: a stale writer enforces AND preserves a constraint " +
    "another session added after it opened the table") {
    val lake = tmpDir("chk")
    val sess = spark.newSession()
    sess.conf.set("spark.sql.catalog.lake", "graft.sources.GraftCatalog")
    sess.conf.set("spark.sql.catalog.lake.warehouse", lake)
    sess.sql("CREATE TABLE lake.default.x (id BIGINT, v DOUBLE) " +
      "OPTIONS (primaryKey 'id')")
    sess.sql("INSERT INTO lake.default.x VALUES (1, 1.0)")

    // session A opens the table BEFORE the constraint exists — its config
    // carries no constraints and is never refreshed
    val a = CowTable(spark, lake + "/x", TableConfig("x", Seq("id")))
    assert(a.currentVersion == 2)

    // session B adds the constraint (durable property commit)
    sess.sql("ALTER TABLE lake.default.x " +
      "SET TBLPROPERTIES ('checkConstraints' = 'v >= 0')")

    // A's next write must enforce B's constraint (liveCheckConstraints
    // reads the manifest at write time, not construction time)
    intercept[IllegalArgumentException] {
      a.upsert(Seq((2L, -1.0)).toDF("id", "v"))
    }
    // ... and A's SUCCESSFUL write must not erase it from the manifest
    // (commitAt's durable parent∪config union)
    a.upsert(Seq((2L, 2.0)).toDF("id", "v"))
    val after = CowTable.configAt(a.root, TableConfig("x", Seq("id")))
    assert(after.checkConstraints == Seq("v >= 0"),
      s"constraint lost after stale write: ${after.checkConstraints}")
    // still enforced on the NEXT reader's write
    intercept[Exception] {
      sess.sql("INSERT INTO lake.default.x VALUES (3, -7.0)")
    }
  }

  test("UNSET TBLPROPERTIES drops constraints durably; narrowing SET " +
    "replaces rather than unioning") {
    val lake = tmpDir("chk")
    val sess = spark.newSession()
    sess.conf.set("spark.sql.catalog.lake", "graft.sources.GraftCatalog")
    sess.conf.set("spark.sql.catalog.lake.warehouse", lake)
    sess.sql("CREATE TABLE lake.default.u (id BIGINT, v DOUBLE) " +
      "OPTIONS (primaryKey 'id', checkConstraints 'v >= 0; id > 0')")
    sess.sql("INSERT INTO lake.default.u VALUES (1, 1.0)")
    intercept[Exception] {
      sess.sql("INSERT INTO lake.default.u VALUES (2, -1.0)")
    }
    // narrowing SET: only id > 0 survives
    sess.sql("ALTER TABLE lake.default.u " +
      "SET TBLPROPERTIES ('checkConstraints' = 'id > 0')")
    sess.sql("INSERT INTO lake.default.u VALUES (2, -1.0)") // v<0 now fine
    intercept[Exception] {
      sess.sql("INSERT INTO lake.default.u VALUES (-3, 1.0)") // id>0 kept
    }
    // full UNSET: everything goes, durably — also for a fresh API writer
    sess.sql("ALTER TABLE lake.default.u UNSET TBLPROPERTIES ('checkConstraints')")
    sess.sql("INSERT INTO lake.default.u VALUES (-3, -1.0)")
    val t = CowTable(spark, lake + "/u", TableConfig("u", Seq("id")))
    assert(CowTable.configAt(t.root, TableConfig("u", Seq("id")))
      .checkConstraints.isEmpty)
    t.upsert(Seq((-4L, -4.0)).toDF("id", "v")) // no constraint anywhere
    assert(t.read().count() == 4)
  }

  test("a literal ';' inside a constraint's string constant does not " +
    "split the constraint (quote-aware delimiter)") {
    val lake = tmpDir("chk")
    val sess = spark.newSession()
    sess.conf.set("spark.sql.catalog.lake", "graft.sources.GraftCatalog")
    sess.conf.set("spark.sql.catalog.lake.warehouse", lake)
    sess.sql("CREATE TABLE lake.default.s (id BIGINT, c STRING) " +
      "OPTIONS (primaryKey 'id', " +
      "checkConstraints \"c <> 'a;b'; id > 0\")")
    sess.sql("INSERT INTO lake.default.s VALUES (1, 'a'), (2, 'b')")
    intercept[Exception] { // the ';'-holding literal IS the constraint
      sess.sql("INSERT INTO lake.default.s VALUES (3, 'a;b')")
    }
    intercept[Exception] { // ... and the fragment AFTER the ';' also binds
      sess.sql("INSERT INTO lake.default.s VALUES (-4, 'z')")
    }
    assert(sess.table("lake.default.s").count() == 2)
    // an unterminated quote is rejected loudly at DDL time
    val bad = intercept[Exception] {
      sess.sql("CREATE TABLE lake.default.s2 (id BIGINT, c STRING) " +
        "OPTIONS (primaryKey 'id', checkConstraints \"c <> 'a\")")
    }
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(bad).exists(_.contains("unterminated")),
      msgs(bad).mkString(" | "))
  }
}
