package graft.sources

import graft.SparkSpec
import graft.storage.{CowTable, TableConfig}
import org.apache.spark.sql.SparkSession

/** SQL surface of column mapping: ALTER TABLE RENAME/DROP COLUMN through
  * the catalog, and every connector path (scan, INSERT, MERGE, UPDATE,
  * change feed) resolving logical names to the stable physical names. */
class ColumnMappingSqlSpec extends SparkSpec {

  private def lakeSession(lake: String): SparkSession = {
    val sess = spark.newSession()
    sess.conf.set("spark.sql.catalog.lake", "graft.sources.GraftCatalog")
    sess.conf.set("spark.sql.catalog.lake.warehouse", lake)
    sess
  }

  test("ALTER TABLE RENAME COLUMN: metadata-only, all SQL paths follow") {
    val lake = tmpDir("cmsql")
    val sess = lakeSession(lake)
    sess.sql("CREATE TABLE lake.default.t (id BIGINT, v STRING) " +
      "OPTIONS (primaryKey 'id')")
    sess.sql("INSERT INTO lake.default.t VALUES (1, 'a'), (2, 'b')")
    sess.sql("ALTER TABLE lake.default.t RENAME COLUMN v TO label")
    // scan under the new name, old data intact
    assert(sess.sql("SELECT label FROM lake.default.t WHERE id = 1")
      .collect().map(_.getString(0)).toSeq == Seq("a"))
    // INSERT through the connector writes the stable PHYSICAL name
    sess.sql("INSERT INTO lake.default.t VALUES (3, 'c')")
    // UPDATE (row-level op) through the rename
    sess.sql("UPDATE lake.default.t SET label = 'B' WHERE id = 2")
    // MERGE through the rename
    sess.sql("SELECT * FROM VALUES (3, 'C'), (9, 'i') AS s(id, label)")
      .createOrReplaceTempView("src")
    sess.sql(
      """MERGE INTO lake.default.t t USING src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = sess.table("lake.default.t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "B", 3L -> "C", 9L -> "i"), got)
    // every data file still stores the ORIGINAL physical name
    val m = CowTable(spark, lake + "/t", TableConfig("t", Seq("id")))
    assert(m.manifest(m.currentVersion).columnMapping == Map("label" -> "v"))
  }

  test("ALTER TABLE DROP COLUMN + re-ADD: nulls, never resurrected bytes") {
    val lake = tmpDir("cmsql")
    val sess = lakeSession(lake)
    sess.sql("CREATE TABLE lake.default.d (id BIGINT, v STRING, n BIGINT) " +
      "OPTIONS (primaryKey 'id')")
    sess.sql("INSERT INTO lake.default.d VALUES (1, 'a', 10), (2, 'b', 20)")
    sess.sql("ALTER TABLE lake.default.d DROP COLUMN v")
    assert(sess.table("lake.default.d").columns.toSeq == Seq("id", "n"))
    sess.sql("ALTER TABLE lake.default.d ADD COLUMN v STRING")
    // the re-added v reads NULL for pre-drop rows — the old bytes are dead
    val got = sess.sql("SELECT id, v FROM lake.default.d").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> None, 2L -> None), got)
    sess.sql("INSERT INTO lake.default.d VALUES (3, 30, 'fresh')")
    val m = CowTable(spark, lake + "/d", TableConfig("d", Seq("id")))
    val mf = m.manifest(m.currentVersion)
    assert(mf.columnMapping.get("v").exists(_ != "v"), mf.columnMapping)
    assert(sess.sql("SELECT v FROM lake.default.d WHERE id = 3")
      .collect().head.getString(0) == "fresh")
  }

  test("batch change-feed scan resolves pre-rename change files") {
    val lake = tmpDir("cmsql")
    val sess = lakeSession(lake)
    sess.sql("CREATE TABLE lake.default.f (id BIGINT, v STRING) " +
      "OPTIONS (primaryKey 'id', changeDataFeed 'true')")
    sess.sql("INSERT INTO lake.default.f VALUES (1, 'a'), (2, 'b')") // v2
    sess.sql("ALTER TABLE lake.default.f RENAME COLUMN v TO label")  // v3
    sess.sql("INSERT INTO lake.default.f VALUES (3, 'c')")           // v4
    val feed = sess.read.format("graft")
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .load(lake + "/f")
      .select("id", "label", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getInt(3))).toSet
    assert(feed == Set((1L, "a", "insert", 2), (2L, "b", "insert", 2),
      (3L, "c", "insert", 4)), feed)
  }
}
