package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class ReleaseSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("id", "name")

  private def mkLake(tag: String): (String, CowTable, CowTable) = {
    val lake = tmpDir(tag)
    val a = CowTable(spark, lake + "/a", TableConfig("a", Seq("id")))
    val b = CowTable(spark, lake + "/b", TableConfig("b", Seq("id")))
    a.create(df((1L, "a1")))
    b.create(df((1L, "b1")))
    LakeRegistry.register(lake, a.config, "a")
    LakeRegistry.register(lake, b.config, "b")
    (lake, a, b)
  }

  test("create pins every member; open sees the release-time snapshot") {
    val (lake, a, b) = mkLake("rel1")
    a.upsert(df((2L, "a2"))) // a at v2, b at v1
    val d = Release.create(spark, lake, "corpus-v1", Seq("a", "b"))
    assert(d.members == Seq(
      Release.Member("a", 2), Release.Member("b", 1)))
    // post-release churn is invisible through the release
    a.upsert(df((3L, "a3")))
    b.upsert(df((2L, "b2")))
    val snap = Release.open(spark, lake, "corpus-v1")
    assert(snap("a").as[(Long, String)].collect().toSet ==
      Set((1L, "a1"), (2L, "a2")))
    assert(snap("b").as[(Long, String)].collect().toSet ==
      Set((1L, "b1")))
    assert(Release.list(lake) == Seq("corpus-v1"))
  }

  test("pins survive vacuum retention churn") {
    val (lake, a, _) = mkLake("rel2")
    Release.create(spark, lake, "r", Seq("a"))
    a.upsert(df((2L, "a2")))
    a.upsert(df((3L, "a3")))
    a.vacuum(retainLast = 1)
    assert(Release.open(spark, lake, "r")("a")
      .as[(Long, String)].collect().toSet == Set((1L, "a1")))
  }

  test("releases are immutable; a half-created release is invisible") {
    val (lake, a, _) = mkLake("rel3")
    Release.create(spark, lake, "r", Seq("a"))
    intercept[IllegalArgumentException](
      Release.create(spark, lake, "r", Seq("a")))
    // crash simulation: a tag landed but no manifest → not a release, and
    // the retried create fails LOUD instead of silently pinning stale
    a.tag("release-half")
    a.upsert(df((2L, "a2")))
    assert(Release.list(lake) == Seq("r"))
    intercept[IllegalArgumentException](
      Release.open(spark, lake, "half"))
    intercept[IllegalArgumentException](
      Release.create(spark, lake, "half", Seq("a")))
  }

  test("SQL surface: CALL lake.create_release / drop_release") {
    val (lake, a, b) = mkLake("rel5")
    val sess = spark.newSession()
    sess.conf.set("spark.sql.catalog.rlake", "graft.sources.GraftCatalog")
    sess.conf.set("spark.sql.catalog.rlake.warehouse", lake)
    assert(sess.sql("CALL rlake.create_release('corpus-v1', 'a, b')")
      .collect().head.getInt(0) == 2)
    a.upsert(df((2L, "a2")))
    // the pinned snapshot resolves through the per-table tag in plain SQL
    assert(sess.sql(
      "SELECT * FROM rlake.default.a VERSION AS OF 'release-corpus-v1'")
      .as[(Long, String)].collect().toSet == Set((1L, "a1")))
    assert(sess.sql("CALL rlake.list_releases()")
      .as[(String, String, Int)].collect().toSet ==
      Set(("corpus-v1", "a", 1), ("corpus-v1", "b", 1)))
    assert(sess.sql("CALL rlake.drop_release('corpus-v1')")
      .collect().head.getInt(0) == 2)
    assert(Release.list(lake).isEmpty && a.tags.isEmpty && b.tags.isEmpty)
    assert(sess.sql("CALL rlake.list_releases()").count() == 0)
  }

  test("drop unpublishes atomically and releases the pins") {
    val (lake, a, b) = mkLake("rel4")
    Release.create(spark, lake, "r", Seq("a", "b"))
    Release.drop(spark, lake, "r")
    assert(Release.list(lake).isEmpty)
    assert(!a.tags.contains("release-r") && !b.tags.contains("release-r"))
    // the name is reusable after drop
    Release.create(spark, lake, "r", Seq("a"))
    assert(Release.list(lake) == Seq("r"))
  }
}
