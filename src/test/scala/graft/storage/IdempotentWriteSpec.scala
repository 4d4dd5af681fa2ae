package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IDEMPOTENT WRITES ([[CowTable.withTxn]], the Delta txnAppId/txnVersion
  * contract): a replayed (appId, version) applies exactly once even when
  * the batch is read-modify-write (the case where blind replay corrupts),
  * markers scope to ONE operation, apps are independent, the same-txn
  * conflict check holds under a concurrent CAS race, and the DSv2 write
  * options surface the contract to `df.write.format("graft")`. */
class IdempotentWriteSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, Long)*): DataFrame =
    rows.toSeq.toDF("id", "bal")

  test("replayed read-modify-write batch applies exactly once") {
    val dir = tmpDir("txn") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id")))
    t.create((1L to 20L).map(i => (i, 100L)).toDF("id", "bal"))

    // the dangerous shape: the batch DERIVES from current table state
    def bump(): DataFrame =
      t.read().filter($"id" % 5 === 0).withColumn("bal", $"bal" + 7)

    val v1 = t.withTxn("loader", 1L).upsert(bump())
    assert(v1 == 2 && t.lastTxnVersion("loader").contains(1L))
    // crash-recovery replay of batch 1: same marker, re-derived source —
    // an un-guarded apply would bump AGAIN (to 114)
    val v1b = t.withTxn("loader", 1L).upsert(bump())
    assert(v1b == 2 && t.currentVersion == 2)
    assert(t.read().filter($"id" === 5L).select("bal").as[Long].head == 107L)

    // the NEXT batch id applies normally
    val v2 = t.withTxn("loader", 2L).upsert(bump())
    assert(v2 == 3 && t.lastTxnVersion("loader").contains(2L))
    assert(t.read().filter($"id" === 5L).select("bal").as[Long].head == 114L)

    // replayed delete is a no-op too
    val d = t.withTxn("loader", 3L).delete(Seq(Tuple1(10L)).toDF("id"))
    assert(d == 4)
    assert(t.withTxn("loader", 3L).delete(Seq(Tuple1(15L)).toDF("id")) == 4)
    assert(t.read().filter($"id" === 15L).count() == 1)
  }

  test("marker scopes to one operation; later un-tagged writes never skip") {
    val dir = tmpDir("txn") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id")))
    t.create(df((1L, 1L)))
    t.withTxn("app", 5L).upsert(df((2L, 2L)))
    // un-tagged mutation right after: must APPLY (marker consumed above)
    val v = t.upsert(df((3L, 3L)))
    assert(v == 3 && t.read().count() == 3)
    // and must not have been stamped with the stale marker
    assert(t.manifest(3).streamQueryId.isEmpty)
    // a SKIPPED replay consumes the marker too
    t.withTxn("app", 5L).upsert(df((4L, 4L)))
    assert(t.currentVersion == 3)
    val v2 = t.upsert(df((4L, 4L)))
    assert(v2 == 4 && t.read().count() == 4)
    // an EMPTY tagged batch no-ops WITHOUT committing — and must not leak
    // its marker onto the next un-tagged mutation
    assert(t.withTxn("app", 9L).upsert(df().limit(0)) == 4)
    assert(t.lastTxnVersion("app").contains(5L)) // 9 never committed
    val v3 = t.upsert(df((5L, 5L)))
    assert(v3 == 5 && t.manifest(5).streamQueryId.isEmpty)
  }

  test("appIds are independent; versions are high-water marks") {
    val dir = tmpDir("txn") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id")))
    t.create(df((1L, 1L)))
    t.withTxn("a", 3L).upsert(df((2L, 2L)))
    // lower-or-equal versions of the SAME app skip...
    t.withTxn("a", 2L).upsert(df((9L, 9L)))
    assert(t.read().count() == 2)
    // ...but another app with any version applies
    t.withTxn("b", 1L).upsert(df((3L, 3L)))
    assert(t.read().count() == 3)
    assert(t.lastTxnVersion("a").contains(3L) &&
      t.lastTxnVersion("b").contains(1L) &&
      t.lastTxnVersion("c").isEmpty)
  }

  test("concurrent same-txn replay: CAS loser detects the winner's marker") {
    val dir = tmpDir("txn") + "/t"
    val t1 = CowTable(spark, dir, TableConfig("t", Seq("id")))
    t1.create((1L to 10L).map(i => (i, 0L)).toDF("id", "bal"))
    val t2 = CowTable(spark, dir, TableConfig("t", Seq("id")))
    // both replicas prepared the same batch against v1; replica 1 wins
    val batch = df((1L, 7L), (11L, 7L))
    assert(t1.withTxn("repl", 1L).upsert(batch) == 2)
    // replica 2 replays the same (appId, version) from the STALE parent:
    // its CAS loses, the rebase path finds the winner's marker, and the
    // op resolves as an idempotent no-op instead of double-applying
    t2.withTxn("repl", 1L)
    val out = t2.upsertFrom(1, batch.withColumn("bal", lit(999L)))
    assert(out == 2 && t2.currentVersion == 2)
    assert(t2.read().filter($"id" === 1L).select("bal").as[Long].head == 7L)
  }

  test("deletion-vector tables honor the marker on the MOR paths") {
    val dir = tmpDir("txn") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id"),
      changeDataFeed = true, deletionVectors = true))
    t.create((1L to 30L).map(i => (i, i)).toDF("id", "bal"))
    // DV delete, replayed: one sidecar commit, no double-mark
    assert(t.withTxn("mor", 1L).delete(Seq(Tuple1(3L)).toDF("id")) == 2)
    assert(t.withTxn("mor", 1L).delete(Seq(Tuple1(4L)).toDF("id")) == 2)
    assert(t.read().count() == 29 &&
      t.read().filter($"id" === 4L).count() == 1)
    // MOR upsert (sidecar preimages + appended batch), replayed r-m-w
    def bump() = t.read().filter($"id" % 10 === 0)
      .withColumn("bal", $"bal" + 1)
    assert(t.withTxn("mor", 2L).upsert(bump()) == 3)
    assert(t.withTxn("mor", 2L).upsert(bump()) == 3)
    assert(t.read().filter($"id" === 10L).select("bal").as[Long].head == 11L)
  }

  test("overwrite and create honor the marker") {
    val dir = tmpDir("txn") + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id")))
    assert(t.withTxn("boot", 0L).create(df((1L, 1L))) == 1)
    // replayed CREATE batch: no-op instead of "already exists"
    assert(t.withTxn("boot", 0L).create(df((9L, 9L))) == 1)
    assert(t.read().as[(Long, Long)].collect().toSet == Set((1L, 1L)))
    assert(t.withTxn("boot", 1L).overwrite(df((2L, 2L))) == 2)
    assert(t.withTxn("boot", 1L).overwrite(df((3L, 3L))) == 2)
    assert(t.read().as[(Long, Long)].collect().toSet == Set((2L, 2L)))
  }

  test("DSv2 write options txnAppId/txnVersion: replayed INSERT is a no-op") {
    val lake = tmpDir("txnsql")
    val dir = lake + "/t"
    val t = CowTable(spark, dir, TableConfig("t", Seq("id")))
    t.create(df((1L, 1L)))
    def insert(v: Long, rows: (Long, Long)*): Unit =
      rows.toSeq.toDF("id", "bal").write.format("graft")
        .option("txnAppId", "etl").option("txnVersion", v)
        .mode("append").save(dir)
    insert(1L, (2L, 2L))
    insert(1L, (999L, 999L)) // replay: must not land
    insert(2L, (3L, 3L))
    assert(t.read().as[(Long, Long)].collect().toSet ==
      Set((1L, 1L), (2L, 2L), (3L, 3L)))
    assert(t.lastTxnVersion("etl").contains(2L))
    // half-specified options fail loud at planning time (message may sit
    // anywhere in Spark's wrapped cause chain)
    val e = intercept[Exception] {
      df((4L, 4L)).write.format("graft")
        .option("txnAppId", "etl").mode("append").save(dir)
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("; ")
    assert(msgs.contains("txnAppId and txnVersion"))
  }
}
