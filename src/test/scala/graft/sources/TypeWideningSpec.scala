package graft.sources

import graft.SparkSpec
import graft.storage.{CowTable, TableConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DecimalType, LongType}

/** ALTER COLUMN ... TYPE as METADATA-ONLY lossless widening (Delta's
  * type-widening feature): the commit carries the new schema and zero data;
  * pre-widen files keep their narrower physical type and both readers
  * promote at scan time. Stats-skipping must stay EXACT across the widen —
  * pre-widen stat strings parse identically under the wider type. */
class TypeWideningSpec extends SparkSpec {

  private def lakeSession(lake: String): SparkSession = {
    val sess = spark.newSession()
    sess.conf.set("spark.sql.catalog.lake", "graft.sources.GraftCatalog")
    sess.conf.set("spark.sql.catalog.lake.warehouse", lake)
    sess
  }

  test("INT→BIGINT widen is metadata-only; old files promote on read") {
    val lake = tmpDir("widen")
    val sess = lakeSession(lake)
    sess.sql("CREATE TABLE lake.default.w (id BIGINT, n INT, v STRING) " +
      "OPTIONS (primaryKey 'id')")
    sess.sql("INSERT INTO lake.default.w VALUES (1, 10, 'a'), (2, 20, 'b')")
    sess.sql("ALTER TABLE lake.default.w ALTER COLUMN n TYPE BIGINT") // v3
    val t = CowTable(spark, lake + "/w", TableConfig("w", Seq("id")))
    assert(t.currentVersion == 3)
    // same files, nothing rewritten, reorganization-style commit
    assert(t.manifest(3).files == t.manifest(2).files)
    assert(!t.manifest(3).dataChange)
    assert(CowTable.structFromJson(t.manifest(3).schemaJson)("n")
      .dataType == LongType)
    // post-widen write carries values beyond INT range; the scan unions
    // INT32-physical and INT64-physical files under one LongType column
    sess.sql("INSERT INTO lake.default.w VALUES (3, 4000000000, 'c')")
    val got = sess.sql(
      "SELECT id, n FROM lake.default.w ORDER BY id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.toSeq == Seq(1L -> 10L, 2L -> 20L, 3L -> 4000000000L),
      got.toSeq.mkString(", "))
    assert(sess.sql("SELECT SUM(n) FROM lake.default.w").head().getLong(0)
      == 4000000030L)
    // the row-oriented reader promotes identically to the vectorized one
    val viaRows = spark.read.format("graft").option("columnar", "false")
      .load(lake + "/w").selectExpr("id", "n").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    assert(viaRows == Seq(1L -> 10L, 2L -> 20L, 3L -> 4000000000L))
    // a mutation through the row-level path reads promoted values too
    sess.sql("DELETE FROM lake.default.w WHERE n = 20")
    assert(sess.table("lake.default.w").count() == 2)
  }

  test("widened PRIMARY KEY keeps stat-pruning exact across old files") {
    val lake = tmpDir("widen")
    val sess = lakeSession(lake)
    sess.sql("CREATE TABLE lake.default.k (id INT, v STRING) " +
      "OPTIONS (primaryKey 'id')")
    sess.sql("INSERT INTO lake.default.k VALUES (1, 'a'), (2, 'b')")
    sess.sql("ALTER TABLE lake.default.k ALTER COLUMN id TYPE BIGINT")
    sess.sql("INSERT INTO lake.default.k VALUES (4000000000, 'c')")
    // point lookup on a pre-widen key: the INT-era file's stat strings
    // ("1","2") must still prune the post-widen file and hit exactly
    val hit = sess.sql("SELECT v FROM lake.default.k WHERE id = 2")
    val plan = hit.queryExecution.executedPlan.toString
    val m = """files=(\d+)/(\d+)""".r.findFirstMatchIn(plan).getOrElse(
      fail(s"no manifest scan in plan:\n$plan"))
    assert(m.group(1).toInt == 1 && m.group(2).toInt > 1, m.group(0))
    assert(hit.collect().map(_.getString(0)).toSeq == Seq("b"))
    // and a beyond-INT lookup prunes the INT-era files
    val big = sess.sql(
      "SELECT v FROM lake.default.k WHERE id = 4000000000")
    val m2 = """files=(\d+)/(\d+)""".r.findFirstMatchIn(
      big.queryExecution.executedPlan.toString).get
    assert(m2.group(1).toInt == 1 && m2.group(2).toInt > 1, m2.group(0))
    assert(big.collect().map(_.getString(0)).toSeq == Seq("c"))
  }

  test("DECIMAL widens by precision at the same scale, values exact") {
    val lake = tmpDir("widen")
    val sess = lakeSession(lake)
    sess.sql("CREATE TABLE lake.default.d (id BIGINT, amt DECIMAL(5,2)) " +
      "OPTIONS (primaryKey 'id')")
    sess.sql("INSERT INTO lake.default.d VALUES (1, 123.45), (2, 0.05)")
    sess.sql("ALTER TABLE lake.default.d ALTER COLUMN amt TYPE DECIMAL(12,2)")
    val t = CowTable(spark, lake + "/d", TableConfig("d", Seq("id")))
    assert(!t.manifest(t.currentVersion).dataChange)
    assert(CowTable.structFromJson(t.manifest(t.currentVersion).schemaJson)(
      "amt").dataType == DecimalType(12, 2))
    sess.sql("INSERT INTO lake.default.d VALUES (3, 9876543210.99)")
    val got = sess.sql("SELECT id, amt FROM lake.default.d ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getDecimal(1).toPlainString)
    assert(got.toSeq == Seq(1L -> "123.45", 2L -> "0.05",
      3L -> "9876543210.99"), got.toSeq.mkString(", "))
    assert(sess.sql("SELECT SUM(amt) FROM lake.default.d").head()
      .getDecimal(0).toPlainString == "9876543334.49")
  }

  test("a widened column's DEFAULT refolds under the new type") {
    val lake = tmpDir("widen")
    val sess = lakeSession(lake)
    sess.sql("CREATE TABLE lake.default.f (id BIGINT, v STRING) " +
      "OPTIONS (primaryKey 'id')")
    sess.sql("INSERT INTO lake.default.f VALUES (1, 'a')")
    sess.sql("ALTER TABLE lake.default.f ADD COLUMN w INT DEFAULT 7")
    sess.sql("ALTER TABLE lake.default.f ALTER COLUMN w TYPE BIGINT")
    // the pre-ADD file reads the (re-typed) existence default as a long
    val got = sess.sql("SELECT id, w FROM lake.default.f").head()
    assert(got.getLong(0) == 1L && got.getLong(1) == 7L, got.toString)
    // CURRENT_DEFAULT still resolves for inserts that omit the column
    sess.sql("INSERT INTO lake.default.f (id, v) VALUES (2, 'b')")
    assert(sess.sql("SELECT w FROM lake.default.f WHERE id = 2").head()
      .getLong(0) == 7L)
  }

  test("change feed across a widen: both eras conform to the wide type") {
    val lake = tmpDir("widen")
    val sess = lakeSession(lake)
    sess.sql("CREATE TABLE lake.default.cf (id BIGINT, n INT) " +
      "TBLPROPERTIES (primaryKey 'id', changeDataFeed 'true')")   // v1
    sess.sql("INSERT INTO lake.default.cf VALUES (1, 10), (2, 20)") // v2
    sess.sql("ALTER TABLE lake.default.cf ALTER COLUMN n TYPE BIGINT") // v3
    sess.sql("INSERT INTO lake.default.cf VALUES (3, 4000000000)")  // v4
    sess.sql("DELETE FROM lake.default.cf WHERE id = 1")            // v5
    val got = spark.read.format("graft").option("readChangeFeed", "true")
      .option("startingVersion", "1").load(lake + "/cf")
      .select("id", "n", "_change_type", "_commit_version")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
      .toSet
    // the schema-bearing widen commit itself emits nothing (reorg); the
    // INT-era inserts read as longs; the post-widen insert and the delete
    // preimage ride normally
    assert(got == Set(
      (1L, 10L, "insert", 2), (2L, 20L, "insert", 2),
      (3L, 4000000000L, "insert", 4),
      (1L, 10L, "delete", 5)), got.toString)
    // the API path agrees
    val t = graft.storage.CowTable(spark, lake + "/cf",
      graft.storage.TableConfig("cf", Seq("id"), changeDataFeed = true))
    val api = t.readChangeFeed(0, t.currentVersion)
      .select("id", "n", "_change_type", "_commit_version")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
      .toSet
    assert(api == got, api.toString)
  }

  test("rollback on a CDF table stays usable across a metadata-only widen") {
    val lake = tmpDir("widen")
    val sess = lakeSession(lake)
    sess.sql("CREATE TABLE lake.default.rb (id BIGINT, n INT) " +
      "TBLPROPERTIES (primaryKey 'id', changeDataFeed 'true')")      // v1
    sess.sql("INSERT INTO lake.default.rb VALUES (1, 10), (2, 20)")  // v2
    sess.sql("ALTER TABLE lake.default.rb ALTER COLUMN n TYPE BIGINT") // v3
    sess.sql("INSERT INTO lake.default.rb VALUES (3, 30)")           // v4
    val t = graft.storage.CowTable(spark, lake + "/rb",
      graft.storage.TableConfig("rb", Seq("id"), changeDataFeed = true))
    // the restore diff must read the CURRENT (post-widen, INT64-physical)
    // era under ITS schema, not the target's INT — pre-fix this threw at
    // scan time, making rollback unusable on any widened CDF table
    val v5 = t.rollbackTo(2)
    assert(t.manifest(v5).cdcDir.isDefined, "restore diff not materialized")
    val roll = t.readChangeFeed(4, v5)
      .select("id", "n", "_change_type")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(roll == Set((3L, 30, "delete")), roll.toString)
    // table content restored to the narrow era exactly
    assert(sess.sql("SELECT id, n FROM lake.default.rb ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toSeq ==
      Seq(1L -> 10, 2L -> 20))
  }

  test("non-lossless or stat-unsafe retypes are rejected loudly") {
    val lake = tmpDir("widen")
    val sess = lakeSession(lake)
    sess.sql("CREATE TABLE lake.default.r (id BIGINT, n INT, x FLOAT, " +
      "d DOUBLE, a DECIMAL(5,2)) OPTIONS (primaryKey 'id')")
    sess.sql("INSERT INTO lake.default.r VALUES (1, 1, 1.0, 1.0, 1.00)")
    def rejected(ddl: String): Unit = {
      val e = intercept[Exception](sess.sql(ddl))
      assert(e.getMessage.contains("widening") ||
        e.getMessage.contains("INVALID") ||
        e.getMessage.contains("not supported"), s"$ddl → ${e.getMessage}")
    }
    rejected("ALTER TABLE lake.default.r ALTER COLUMN id TYPE INT")
    rejected("ALTER TABLE lake.default.r ALTER COLUMN n TYPE STRING")
    // narrowing double→float stays rejected; float→double is now a
    // supported widening (stat strings re-derive — see the test below)
    rejected("ALTER TABLE lake.default.r ALTER COLUMN d TYPE FLOAT")
    rejected("ALTER TABLE lake.default.r ALTER COLUMN a TYPE DECIMAL(10,4)")
    rejected("ALTER TABLE lake.default.r ALTER COLUMN a TYPE DECIMAL(4,2)")
    // nothing committed by any rejected attempt
    val t = CowTable(spark, lake + "/r", TableConfig("r", Seq("id")))
    assert(t.currentVersion == 2)
  }

  test("FLOAT→DOUBLE widens metadata-only; float-era stats re-derive and " +
      "stay exact at the boundary value") {
    val lake = tmpDir("widen")
    val sess = lakeSession(lake)
    // x declared a stats column so per-file float ranges ride the manifest
    sess.sql("CREATE TABLE lake.default.fd (id BIGINT, x FLOAT) " +
      "TBLPROPERTIES (primaryKey 'id', statsColumns 'x')")
    // one float-era file whose max is (float)0.1 — shortest-form stat "0.1"
    sess.sql("INSERT INTO lake.default.fd VALUES (1, CAST(0.05 AS FLOAT))," +
      " (2, CAST(0.1 AS FLOAT))")
    sess.sql("ALTER TABLE lake.default.fd ALTER COLUMN x TYPE DOUBLE")
    val t = CowTable(spark, lake + "/fd", TableConfig("fd", Seq("id")))
    val m = t.manifest(t.currentVersion)
    assert(!m.dataChange, "widen must be metadata-only")
    assert(CowTable.structFromJson(m.schemaJson)("x").dataType ==
      org.apache.spark.sql.types.DoubleType)
    // the stat string is the DOUBLE print of the exact float now — NOT the
    // float-era shortest form "0.1" (which would mis-skip below)
    val mxs = m.files.flatMap(_.extra.get("x")).flatMap(_.mx)
    assert(mxs.contains(((0.1f).toDouble).toString),
      s"stat not re-derived: $mxs")
    // the mis-skip probe: (double)(float)0.1 ≈ 0.100000001490116 > 0.1 —
    // a predicate strictly between must still FIND the row. Under stale
    // float-era stats (max "0.1") the file would have been skipped.
    val hit = sess.sql("SELECT id FROM lake.default.fd WHERE x > 0.1")
    assert(hit.collect().map(_.getLong(0)).toSeq == Seq(2L),
      "boundary row lost — float-era stats mis-skipped after the widen")
    // post-widen inserts mix eras; full scan unions FLOAT- and DOUBLE-
    // physical files under one DoubleType column in both reader modes
    sess.sql("INSERT INTO lake.default.fd VALUES (3, CAST(1e300 AS DOUBLE))")
    val got = sess.sql("SELECT id, x FROM lake.default.fd ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(got == Seq(1L -> (0.05f).toDouble, 2L -> (0.1f).toDouble,
      3L -> 1e300), got.mkString(", "))
    val viaRows = spark.read.format("graft").option("columnar", "false")
      .load(lake + "/fd").selectExpr("id", "x").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq.sortBy(_._1)
    assert(viaRows == got)
  }
}
