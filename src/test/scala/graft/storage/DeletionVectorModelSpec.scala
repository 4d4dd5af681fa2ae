package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Model-based equivalence: a SEEDED random operation sequence applied to
  * a deletion-vector table and a plain COW table must leave identical
  * logical state after every step — MOR is an encoding, never a
  * semantics change. Mixes upserts (update+insert), deletes (hitting
  * vectored and plain files), purges and compactions (which materialize
  * vectors), and checks the change feed row-for-row too.
  */
class DeletionVectorModelSpec extends SparkSpec {
  import spark.implicits._

  private def rows(r: Seq[(Long, String, Double)]): DataFrame =
    r.toDF("id", "name", "v")

  private def state(t: CowTable): Set[(Long, String, Double)] =
    t.read().as[(Long, String, Double)].collect().toSet

  test("seeded random op sequence: MOR ≡ COW at every step") {
    val rnd = new scala.util.Random(20260814L)
    val dir = tmpDir("dvmodel")
    val cow = CowTable(spark, dir + "/cow",
      TableConfig("cow", Seq("id"), changeDataFeed = true))
    val mor = CowTable(spark, dir + "/mor",
      TableConfig("mor", Seq("id"),
        changeDataFeed = true, deletionVectors = true))
    val init = (1L to 120L).map(i => (i, s"n$i", i * 0.5))
    cow.create(rows(init).repartition(3))
    mor.create(rows(init).repartition(3))

    var model: Map[Long, (String, Double)] =
      init.map(r => r._1 -> (r._2, r._3)).toMap

    for (step <- 1 to 14) {
      rnd.nextInt(4) match {
        case 0 | 1 => // upsert: mix of updates and fresh inserts
          val n = 1 + rnd.nextInt(8)
          val batch = (1 to n).map { _ =>
            val id = 1L + rnd.nextInt(160) // ids beyond 120 are inserts
            (id, s"s$step-$id", rnd.nextInt(1000) * 0.25)
          }.distinctBy(_._1)
          cow.upsert(rows(batch)); mor.upsert(rows(batch))
          model ++= batch.map(r => r._1 -> (r._2, r._3))
        case 2 => // delete: some hit earlier-vectored files, some miss
          val keys = (1 to 1 + rnd.nextInt(6))
            .map(_ => 1L + rnd.nextInt(160)).distinct
          cow.delete(keys.toDF("id")); mor.delete(keys.toDF("id"))
          model --= keys
        case 3 => // maintenance materializes vectors; content must not move
          rnd.nextInt(3) match {
            case 0 => mor.purgeDeletionVectors()
            case 1 => mor.optimize(Seq("id")) // rewrite retires vectors too
            case 2 => mor.compact(smallBytes = 1L << 20)
          }
          cow.compact(smallBytes = 1L << 20)
      }
      val mSet = state(mor)
      assert(mSet == state(cow), s"MOR/COW diverged at step $step")
      assert(mSet == model.map { case (k, (nm, v)) => (k, nm, v) }.toSet,
        s"engine diverged from the in-memory model at step $step")
    }

    // the cumulative change feeds must describe the same logical history:
    // net effect per key (last change wins, deletes remove) equals state
    def netOfFeed(t: CowTable): Set[(Long, String, Double)] = {
      val feed = t.readChangeFeed(0, t.currentVersion) // incl. initial load
        .filter(org.apache.spark.sql.functions
          .col("_change_type") =!= "update_preimage")
        .select("id", "name", "v", "_change_type", "_commit_version")
        .as[(Long, String, Double, String, Int)].collect()
      val byKey = feed.groupBy(_._1)
      byKey.flatMap { case (id, changes) =>
        val last = changes.maxBy(_._5)
        if (last._4 == "delete") None else Some((id, last._2, last._3))
      }.toSet
    }
    assert(netOfFeed(mor) == state(mor),
      "MOR change feed net effect must equal final state")
    assert(netOfFeed(mor) == netOfFeed(cow),
      "MOR and COW feeds must net to the same history")
  }
}
