package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class TagsSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("id", "name")

  test("tag pins a version; reads resolve it after any churn") {
    val dir = tmpDir("tags") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id")))
    t.create(df((1L, "a"), (2L, "b")))
    assert(t.tag("release1") == 1)
    t.upsert(df((1L, "a2"), (3L, "c")))
    t.upsert(df((4L, "d")))
    assert(t.tags == Map("release1" -> 1))
    assert(t.readTag("release1").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    // connector surface: option("versionAsOf", "<tag>")
    assert(spark.read.format("graft").option("versionAsOf", "release1")
      .load(dir).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft").option("versionAsOf", "nope").load(dir)
        .collect()
    }
    assert(e.getMessage.contains("no tag 'nope'"))
  }

  test("tags are immutable; drop-then-re-pin moves them explicitly") {
    val dir = tmpDir("tags") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id")))
    t.create(df((1L, "a")))
    t.upsert(df((2L, "b")))
    t.tag("rel", 1)
    val e = intercept[IllegalArgumentException](t.tag("rel", 2))
    assert(e.getMessage.contains("immutable"))
    t.dropTag("rel")
    assert(t.tag("rel", 2) == 2)
    assert(t.readTag("rel").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    intercept[IllegalArgumentException](t.dropTag("ghost"))
    intercept[IllegalArgumentException](t.tag("bad/name"))
    intercept[IllegalArgumentException](t.tag("ok", 99))
  }

  test("vacuum never expires a tagged version; dropping the tag releases it") {
    val dir = tmpDir("tags") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id")))
    t.create(df((1L, "a")))
    t.tag("pinned") // v1
    t.overwrite(df((2L, "b")))
    t.overwrite(df((3L, "c")))
    t.overwrite(df((4L, "d")))
    t.vacuum(retainLast = 1, orphanOlderThanMs = Long.MaxValue)
    // v1 survived the retention pass because the tag pins it
    assert(t.readTag("pinned").as[(Long, String)].collect().toSet ==
      Set((1L, "a")))
    assert(t.earliestReadableVersion == 1)
    t.dropTag("pinned")
    t.vacuum(retainLast = 1, orphanOlderThanMs = Long.MaxValue)
    assert(t.earliestReadableVersion == t.currentVersion)
    intercept[IllegalArgumentException](t.readVersion(1))
    // tagging an expired version is rejected
    intercept[IllegalArgumentException](t.tag("late", 1))
  }

  test("SQL surface: CALL lake.tag + VERSION AS OF '<tag>'") {
    val lake = tmpDir("taglake")
    val t = CowTable(spark, lake + "/ev", TableConfig("ev", Seq("id")))
    t.create(df((1L, "a"), (2L, "b")))
    LakeRegistry.register(lake, TableConfig("ev", Seq("id")), lake + "/ev")
    val sess = spark.newSession()
    sess.conf.set("spark.sql.catalog.taglake", "graft.sources.GraftCatalog")
    sess.conf.set("spark.sql.catalog.taglake.warehouse", lake)
    assert(sess.sql("CALL taglake.tag('ev', 'r1')")
      .collect().head.getInt(0) == 1)
    t.upsert(df((1L, "a2")))
    assert(sess.sql(
      "SELECT * FROM taglake.default.ev VERSION AS OF 'r1'")
      .as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    assert(sess.sql("SELECT * FROM taglake.default.ev")
      .as[(Long, String)].collect().toSet == Set((1L, "a2"), (2L, "b")))
    sess.sql("CALL taglake.drop_tag('ev', 'r1')")
    assert(t.tags.isEmpty)
  }

  test("$tags metadata table lists refs with their pinned commit") {
    val lake = tmpDir("taglake2")
    val t = CowTable(spark, lake + "/ev", TableConfig("ev", Seq("id")))
    t.create(df((1L, "a")))
    t.upsert(df((2L, "b")))
    t.tag("r1", 1)
    t.tag("r2", 2)
    LakeRegistry.register(lake, TableConfig("ev", Seq("id")), lake + "/ev")
    val sess = spark.newSession()
    sess.conf.set("spark.sql.catalog.tl2", "graft.sources.GraftCatalog")
    sess.conf.set("spark.sql.catalog.tl2.warehouse", lake)
    assert(sess.sql("SELECT name, version FROM tl2.default.`ev$tags`")
      .as[(String, Int)].collect().toSet == Set(("r1", 1), ("r2", 2)))
  }
}
