package graft.sources

import graft.SparkSpec
import graft.storage.{CowTable, TableConfig}
import org.apache.spark.sql.functions._

/** DIFFERENTIAL property test for the change feed: the DSv2 scan
  * (`option("readChangeFeed","true")`, file-partition planning incl. the
  * drop-only synthesis) and the independent API implementation
  * (`CowTable.readChangeFeed`, file-diff join) must report the IDENTICAL
  * multiset of change rows over random mutation histories — appends,
  * materialized-CDF row-level deletes/upserts (DV sidecars), retention
  * DELETEs that may or may not be metadata-decidable, and reorganization
  * commits (skipped by both). Any divergence is a bug in one of the two
  * planners by construction. */
class CdfDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private type Feed = Map[(Long, String, String, Int), Long]

  private def multiset(df: org.apache.spark.sql.DataFrame): Feed =
    df.select(col("id"), coalesce(col("name"), lit("∅")).as("name"),
        col("_change_type"), col("_commit_version"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap

  test("DSv2 feed ≡ API readChangeFeed over random mutation histories") {
    // dv=true: mutations via DV sidecars; dv=false: the GROUP-REPLACE COW
    // path (CowTable.replaceCdc materialization) — both planners must agree
    for ((dv, seed) <- Seq((true, 1), (true, 2), (false, 3), (false, 4))) {
      val rnd = new scala.util.Random(seed)
      val dir = tmpDir("cdfdiff") + "/t"
      val t = CowTable(spark, dir,
        TableConfig("t", Seq("id"), clusterByKey = true,
          changeDataFeed = true, deletionVectors = dv))
      var nextId = 41L
      t.create((1L to 40L).map(i => (i, s"n$i")).toDF("id", "name")
        .repartitionByRange(4, $"id"))
      val live = scala.collection.mutable.Set[Long]((1L to 40L): _*)
      // live KEY set per committed version (rollback restores from here;
      // value-level state is checked by the feed comparison itself)
      val states = scala.collection.mutable.ArrayBuffer[Set[Long]](
        Set.empty, live.toSet) // index = version; v0 unused, v1 = create
      val sqlName = s"cdfdiff_$seed"
      spark.sql(s"DROP TABLE IF EXISTS $sqlName")
      spark.sql(s"CREATE TABLE $sqlName USING graft LOCATION '$dir'")
      try {
        (1 to 6).foreach { _ =>
          val committed = rnd.nextInt(5) match {
            case 0 => // append new keys
              val ids = (nextId until nextId + 3 + rnd.nextInt(4)).toSeq
              nextId = ids.max + 1
              t.upsert(ids.map(i => (i, s"n$i")).toDF("id", "name"))
              live ++= ids; true
            case 1 => // row-level delete of scattered keys (DV + cdc)
              val ks = rnd.shuffle(live.toSeq).take(1 + rnd.nextInt(3))
              if (ks.nonEmpty) { t.delete(ks.toDF("id")); live --= ks }
              ks.nonEmpty
            case 2 => // retention cut: metadata-only iff file-covered
              val sorted = live.toSeq.sorted
              if (sorted.size > 4) {
                val cut = sorted(rnd.nextInt(sorted.size / 2))
                spark.sql(s"DELETE FROM $sqlName WHERE id <= $cut")
                live --= live.filter(_ <= cut)
                true
              } else false
            case 3 => // upsert existing keys (rewrite, materialized cdc)
              val ks = rnd.shuffle(live.toSeq).take(1 + rnd.nextInt(3))
              if (ks.nonEmpty)
                t.upsert(ks.map(i => (i, s"upd$i")).toDF("id", "name"))
              ks.nonEmpty
            case 4 => // rollback: restore-diff materialization (CDF)
              val tgt = 1 + rnd.nextInt(states.size - 1)
              t.rollbackTo(tgt)
              live.clear(); live ++= states(tgt); true
          }
          if (committed) states += live.toSet
        }
        t.compact(smallBytes = 1L << 30) // reorg: both feeds must skip it
        val cur = t.currentVersion
        val dsv2 = multiset(spark.read.format("graft")
          .option("readChangeFeed", "true")
          .option("startingVersion", "1").load(dir))
        val api = multiset(t.readChangeFeed(0, cur))
        assert(dsv2 == api,
          s"seed=$seed diverged:\n only-dsv2=${dsv2.toSet -- api.toSet}\n " +
            s"only-api=${api.toSet -- dsv2.toSet}")
        // sanity: the feed is non-trivial and net-adds match the snapshot
        assert(dsv2.nonEmpty)
        val snapshot = t.read().select("id").as[Long].collect().toSet
        assert(snapshot == live.toSet, s"seed=$seed snapshot drift")
      } finally spark.sql(s"DROP TABLE IF EXISTS $sqlName")
    }
  }
}
