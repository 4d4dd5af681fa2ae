package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MODEL-BASED randomized check of the full storage stack: seeded random
  * op sequences (upsert / delete / compact / optimize / rollback-free)
  * run against a table with EVERY pruning/feed layer enabled — bloom
  * index, statsColumns, changeDataFeed, composite stats — and after every
  * op the table must equal a driver-side Map model exactly. A wrong skip
  * in ANY layer (bloom false negative, stat misprune, CDC misclassify,
  * compaction row loss) surfaces as a model divergence with the seed in
  * the failure message.
  */
class CowTableModelSpec extends SparkSpec {
  import spark.implicits._

  private def cfg = TableConfig("m", Seq("id"),
    bloomIndex = true, statsColumns = Seq("w"), changeDataFeed = true)

  private def runSeed(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val dir = tmpDir(s"model$seed")
    val t = CowTable(spark, dir + "/t", cfg)
    val model = scala.collection.mutable.Map[Long, (String, Long)]()

    def df(rows: Seq[(Long, String, Long)]) = rows.toDF("id", "v", "w")
    def randRows(n: Int): Seq[(Long, String, Long)] =
      (1 to n).map { _ =>
        val k = rnd.nextInt(60).toLong
        (k, s"v${rnd.nextInt(1000)}", rnd.nextInt(500).toLong)
      }.groupBy(_._1).map(_._2.head).toSeq // key-unique source

    // initial snapshot
    val init = randRows(25)
    t.create(df(init))
    init.foreach { case (k, v, w) => model(k) = (v, w) }

    // mid-sequence SHALLOW CLONE probe: fork at a random step, snapshot the
    // model; after the original keeps mutating, the fork must still equal
    // the frozen model (fork isolation across every subsequent op)
    val cloneAtStep = 2 + rnd.nextInt(5)
    var clone: Option[(CowTable, Map[Long, (String, Long)])] = None

    (1 to 8).foreach { step =>
      if (step == cloneAtStep)
        clone = Some((t.shallowClone(dir + "/fork"), model.toMap))
      rnd.nextInt(4) match {
        case 0 | 1 => // upsert
          val batch = randRows(1 + rnd.nextInt(10))
          t.upsert(df(batch))
          batch.foreach { case (k, v, w) => model(k) = (v, w) }
        case 2 => // delete (some keys may be absent — no-ops)
          val keys = (1 to 1 + rnd.nextInt(6))
            .map(_ => rnd.nextInt(60).toLong).distinct
          t.delete(keys.toDF("id"))
          keys.foreach(model.remove)
        case 3 => // reorganize: same rows, new layout
          if (rnd.nextBoolean()) t.compact(smallBytes = 1L << 30)
          else t.optimize(Seq("id", "w"))
      }
      val got = t.read().as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == model.toMap,
        s"seed=$seed step=$step: table ${got.size} rows vs model " +
          s"${model.size}; diff=${(got.toSet diff model.toSet) ++
            (model.toSet diff got.toSet)}")
    }

    // the change feed REPLAYED from v0 must rebuild the final state: every
    // commit's I/U rows applied, D rows removed, in commit order
    val replay = scala.collection.mutable.Map[Long, (String, Long)]()
    t.readChangeFeed(0, t.currentVersion)
      .select("id", "v", "w", "_commit_version", "_change_type")
      .as[(Long, String, Long, Int, String)].collect()
      .sortBy(_._4)
      .foreach {
        case (k, v, w, _, "insert" | "update_postimage") =>
          replay(k) = (v, w)
        case (k, _, _, _, "delete") => replay.remove(k)
        case (_, _, _, _, "update_preimage") => // paired old image: no-op
        case other => fail(s"unexpected feed row $other")
      }
    assert(replay.toMap == model.toMap,
      s"seed=$seed: feed replay diverges from final state")

    // the fork still equals the model AS OF the fork point
    clone.foreach { case (c, frozen) =>
      val got = c.read().as[(Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == frozen,
        s"seed=$seed: shallow clone diverged from its fork-point state")
    }
  }

  test("random op sequences match the model (seeds 1-3)") { runSeed(1) }
  test("random op sequences match the model (seeds 4-6)") { runSeed(5) }
  test("random op sequences match the model (seed 9)") { runSeed(9) }

  /** Same harness over a HIVE-PARTITIONED table (different write branch,
    * partition-path pruning in the mix; z-order keeps the layout). The
    * partition value derives from the key so upserts never move a row
    * across partitions (the engine's documented contract). */
  private def runPartitionedSeed(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val dir = tmpDir(s"modelp$seed")
    val t = CowTable(spark, dir + "/t",
      TableConfig("m", Seq("id"), partitionKey = Some("seg"),
        statsColumns = Seq("w"), changeDataFeed = true))
    val model = scala.collection.mutable.Map[Long, (String, Long)]()
    def seg(k: Long) = s"s${k % 3}"
    def df(rows: Seq[(Long, String, Long)]) =
      rows.toDF("id", "v", "w").withColumn("seg", expr("concat('s', id % 3)"))
        .select("id", "seg", "v", "w")
    def randRows(n: Int): Seq[(Long, String, Long)] =
      (1 to n).map { _ =>
        (rnd.nextInt(40).toLong, s"v${rnd.nextInt(1000)}",
          rnd.nextInt(500).toLong)
      }.groupBy(_._1).map(_._2.head).toSeq

    val init = randRows(20)
    t.create(df(init))
    init.foreach { case (k, v, w) => model(k) = (v, w) }
    (1 to 6).foreach { step =>
      rnd.nextInt(4) match {
        case 0 | 1 =>
          val batch = randRows(1 + rnd.nextInt(8))
          t.upsert(df(batch))
          batch.foreach { case (k, v, w) => model(k) = (v, w) }
        case 2 =>
          val keys = (1 to 1 + rnd.nextInt(5))
            .map(_ => rnd.nextInt(40).toLong).distinct
          t.delete(keys.toDF("id"))
          keys.foreach(model.remove)
        case 3 =>
          if (rnd.nextBoolean()) t.compact(smallBytes = 1L << 30,
            partitionValue = Some(seg(rnd.nextInt(40).toLong)))
          else t.optimize(Seq("id", "w"))
      }
      val got = t.read().select("id", "seg", "v", "w")
        .as[(Long, String, String, Long)].collect()
      assert(got.forall(r => r._2 == seg(r._1)), "partition value drifted")
      val gm = got.map(r => r._1 -> ((r._3, r._4))).toMap
      assert(gm == model.toMap, s"seed=$seed step=$step diff=" +
        s"${(gm.toSet diff model.toSet) ++ (model.toSet diff gm.toSet)}")
      // the DSv2 scan agrees with the API read, partition pruning included
      val viaScan = spark.read.format("graft").load(dir + "/t")
        .filter($"seg" === "s1").select("id").as[Long].collect().toSet
      assert(viaScan == model.keySet.filter(_ % 3 == 1), s"seed=$seed")
    }
  }

  test("partitioned random op sequences match the model (seed 2)") {
    runPartitionedSeed(2)
  }
  test("partitioned random op sequences match the model (seed 7)") {
    runPartitionedSeed(7)
  }
}
