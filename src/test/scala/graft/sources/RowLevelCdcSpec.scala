package graft.sources

import graft.SparkSpec
import graft.storage.{CowTable, TableConfig}
import org.apache.spark.sql.SparkSession

/** The changeDataFeed contract on the GROUP-REPLACE (COW) row-level SQL
  * path: a CDF table WITHOUT deletion vectors mutated through SQL
  * DELETE/UPDATE/MERGE must materialize its exact per-row changes
  * (CowTable.replaceCdc) — previously these commits were bare rewrites the
  * file-partition feed planner could only reject loudly. Carried
  * file-mates (rows rewritten byte-identical purely because they share a
  * file with a touched row) must NOT appear in the feed. */
class RowLevelCdcSpec extends SparkSpec {

  private def lakeSession(lake: String): SparkSession = {
    val sess = spark.newSession()
    sess.conf.set("spark.sql.catalog.lake", "graft.sources.GraftCatalog")
    sess.conf.set("spark.sql.catalog.lake.warehouse", lake)
    sess
  }

  private def feed(dir: String, fromV: Int): Set[(Long, String, String, Int)] =
    spark.read.format("graft").option("readChangeFeed", "true")
      .option("startingVersion", fromV.toString).load(dir)
      .select("id", "v", "_change_type", "_commit_version")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
      .toSet

  test("SQL DELETE/UPDATE/MERGE on a no-DV CDF table materialize exact " +
      "changes; carried file-mates never feed") {
    val lake = tmpDir("rlcdc")
    val sess = lakeSession(lake)
    import sess.implicits._
    (1L to 30L).map(i => (i, s"v$i")).toDF("id", "v")
      .createOrReplaceTempView("src")
    sess.sql("CREATE TABLE lake.default.t OPTIONS (primaryKey 'id', " +
      "changeDataFeed 'true') AS SELECT * FROM src")         // v1 + v2
    val t = CowTable(spark, lake + "/t", TableConfig("t", Seq("id")))

    sess.sql("DELETE FROM lake.default.t WHERE id IN (3, 17)")   // v3
    assert(t.manifest(3).cdcDir.isDefined, "DELETE must materialize cdc")
    assert(feed(lake + "/t", 3) == Set(
      (3L, "v3", "delete", 3), (17L, "v17", "delete", 3)))

    sess.sql("UPDATE lake.default.t SET v = 'upd' WHERE id = 5")  // v4
    assert(feed(lake + "/t", 4) == Set(
      (5L, "v5", "update_preimage", 4), (5L, "upd", "update_postimage", 4)))

    Seq((1L, "m1"), (99L, "m99")).toDF("id", "v")
      .createOrReplaceTempView("mrg")
    sess.sql("MERGE INTO lake.default.t t USING mrg s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")                          // v5
    assert(feed(lake + "/t", 5) == Set(
      (1L, "v1", "update_preimage", 5), (1L, "m1", "update_postimage", 5),
      (99L, "m99", "insert", 5)))

    // the DSv2 feed and the API file-diff feed agree across the whole range
    val api = t.readChangeFeed(0, t.currentVersion)
      .select("id", "v", "_change_type", "_commit_version")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
      .toSet
    assert(feed(lake + "/t", 1) == api)
  }

  test("duplicate primary keys decline CDF materialization — the feed " +
      "fails loudly instead of emitting cross-product change rows") {
    val lake = tmpDir("rlcdc")
    val sess = lakeSession(lake)
    import sess.implicits._
    // plain appends do not enforce pk uniqueness: id=2 lands twice in ONE
    // file (coalesced CTAS), so the UPDATE's scanned side carries a dup key
    Seq((1L, "a"), (2L, "b"), (2L, "B")).toDF("id", "v").coalesce(1)
      .createOrReplaceTempView("dupsrc")
    sess.sql("CREATE TABLE lake.default.d TBLPROPERTIES (primaryKey 'id', " +
      "changeDataFeed 'true') AS SELECT * FROM dupsrc")          // v1 + v2
    sess.sql("UPDATE lake.default.d SET v = 'upd' WHERE id = 1") // v3
    val t = CowTable(spark, lake + "/d", TableConfig("d", Seq("id"),
      changeDataFeed = true))
    // a keyed full-outer diff over a dup-key side would pair id=2's two
    // rows cross-product — materialization declines instead
    assert(t.manifest(3).cdcDir.isEmpty,
      "dup-key commit must not materialize a (wrong) change feed")
    // ...and the file-partition feed reports the rewrite loudly rather
    // than serving fabricated update pre/post images
    val e = intercept[Exception] {
      spark.read.format("graft").option("readChangeFeed", "true")
        .option("startingVersion", "3").load(lake + "/d").collect()
    }
    assert(e.getMessage != null, e.toString)
    // unique-key control on the same shape still materializes exactly
    sess.sql("CREATE TABLE lake.default.u (id BIGINT, v STRING) " +
      "TBLPROPERTIES (primaryKey 'id', changeDataFeed 'true')")
    sess.sql("INSERT INTO lake.default.u VALUES (1,'a'), (2,'b')")
    sess.sql("UPDATE lake.default.u SET v = 'upd' WHERE id = 1")
    val u = CowTable(spark, lake + "/u", TableConfig("u", Seq("id"),
      changeDataFeed = true))
    assert(u.manifest(u.currentVersion).cdcDir.isDefined)
  }
}
