package graft.pipeline

import graft.SparkSpec
import graft.storage.TableConfig
import org.apache.spark.sql.functions._

class LakeJobSpec extends SparkSpec {
  import spark.implicits._

  private val configJson =
    """[
      |  {"table_name": "user_data", "primary_key": "user_id",
      |   "partition_key": "None", "precombine_key": "seq"},
      |  {"table_name": "item_data", "primary_key": "item_id",
      |   "partition_key": "category", "precombine_key": "None"}
      |]""".stripMargin

  test("TableConfigs parses the cdk.json-shaped list with None sentinels") {
    val cfgs = TableConfigs.fromJson(configJson)
    assert(cfgs == Seq(
      TableConfig("user_data", Seq("user_id"), None, Some("seq")),
      TableConfig("item_data", Seq("item_id"), Some("category"), None)))
  }

  test("initialLoad + cdcLoad loop over the configured tables end-to-end") {
    val raw = tmpDir("raw")
    val lake = tmpDir("lake")
    val cfgs = TableConfigs.fromJson(configJson)
    Seq((1L, "alice", 0L), (2L, "bob", 0L)).toDF("user_id", "name", "seq")
      .write.parquet(s"$raw/initial-load/user_data")
    Seq((10L, "sword", "weapon"), (11L, "shield", "armor"))
      .toDF("item_id", "name", "category")
      .write.parquet(s"$raw/initial-load/item_data")

    val created = LakeJob.initialLoad(spark, raw, lake, cfgs)
    assert(created.toSet == Set("user_data", "item_data"))
    // idempotent: second run creates nothing, tables still readable
    assert(LakeJob.initialLoad(spark, raw, lake, cfgs).isEmpty)
    assert(spark.table("user_data").count() == 2)
    assert(spark.table("item_data").count() == 2)

    // CDC arrives for user_data only
    Seq(("U", "2024-01-01 10:00:00", 1L, "alice2", 1L),
      ("D", "2024-01-01 11:00:00", 2L, "bob", 2L))
      .toDF("Op", "timestamp", "user_id", "name", "seq")
      .write.parquet(s"$raw/cdc-load/user_data")
    val r1 = LakeJob.cdcLoad(spark, raw, lake, cfgs,
      auditTs = lit("2024-06-01 00:00:00").cast("timestamp"))
    assert(r1.keySet == Set("user_data"))
    assert(r1("user_data").opCounts == Map("U" -> 1L, "D" -> 1L))
    assert(spark.table("user_data").select("user_id", "name")
      .as[(Long, String)].collect().toSet == Set((1L, "alice2")))
    // second run: bookmark filters everything → "No Data changed."
    assert(LakeJob.cdcLoad(spark, raw, lake, cfgs).isEmpty)

    // ---- durable catalog: a FRESH session (new temp-view catalog, no
    // config file, no prior state) attaches the lake and sees everything,
    // including the post-CDC state of user_data
    val fresh = spark.newSession()
    assertThrows[org.apache.spark.sql.AnalysisException] {
      fresh.table("user_data").count() // proves the session is really fresh
    }
    val attached = graft.storage.LakeRegistry.attach(fresh, lake)
    assert(attached.toSet == Set("user_data", "item_data"))
    assert(fresh.table("user_data").select("user_id", "name")
      .as[(Long, String)].collect().toSet == Set((1L, "alice2")))
    assert(fresh.table("item_data").count() == 2)
    // the registry round-trips full TableConfigs (not just names)
    assert(graft.storage.LakeRegistry.entries(lake)
      .map(_.config).toSet == cfgs.toSet)
    // open() hands back a live CowTable on the registered root
    assert(graft.storage.LakeRegistry.open(fresh, lake, "user_data")
      .currentVersion == 3) // create + upsert + delete
  }
}
