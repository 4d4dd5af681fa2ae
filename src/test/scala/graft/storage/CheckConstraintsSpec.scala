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
}
