package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SURVEY.md §5 property commitments: dedup keeps exactly the max-timestamp
  * row(s) per key, strict dedup picks the unique (ts, precombine)-max, and
  * dedup is idempotent. ScalaCheck generators driven with fixed seeds (the
  * scalatest-scalacheck bridge isn't on the offline classpath); Spark jobs
  * per case are the cost driver, so 8 cases per property. */
class CdcDedupProperties extends SparkSpec {
  import spark.implicits._

  private val rowGen = for {
    key <- Gen.choose(0L, 4L)
    tsOff <- Gen.choose(0, 5)
    seq <- Gen.choose(0L, 1000L)
  } yield (key, java.sql.Timestamp.valueOf(f"2024-01-0${tsOff + 1}%d 00:00:00"), seq)

  private val batchGen = Gen.nonEmptyListOf(rowGen).map(_.take(40))

  private def cases: Seq[List[(Long, java.sql.Timestamp, Long)]] =
    (1 to 8).flatMap(i =>
      batchGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("latestPerKey returns exactly the rows tied at each key's max ts") {
    for (rows <- cases) {
      val df = rows.toDF("id", "ts", "seq")
      val got = CdcDedup.latestPerKey(df, Seq("id"), "ts")
        .as[(Long, java.sql.Timestamp, Long)].collect().toSet
      val expected = rows.groupBy(_._1).values.flatMap { g =>
        val maxTs = g.map(_._2.getTime).max
        g.filter(_._2.getTime == maxTs)
      }.toSet
      assert(got == expected, s"for batch $rows")
    }
  }

  test("latestPerKeyStrict returns exactly one row per key: the (ts,seq)-max") {
    for (rows <- cases) {
      val df = rows.toDF("id", "ts", "seq")
      val got = CdcDedup.latestPerKeyStrict(df, Seq("id"), "ts", Seq("seq"))
        .as[(Long, java.sql.Timestamp, Long)].collect()
      val expected = rows.groupBy(_._1).values.map(
        _.maxBy(r => (r._2.getTime, r._3))).toSet
      assert(got.toSet == expected, s"for batch $rows")
      assert(got.map(_._1).distinct.length == got.length)
    }
  }

  test("dedup is idempotent: applying it twice equals applying it once") {
    for (rows <- cases) {
      val df = rows.toDF("id", "ts", "seq")
      val once = CdcDedup.latestPerKey(df, Seq("id"), "ts")
      val twice = CdcDedup.latestPerKey(once, Seq("id"), "ts")
      assert(once.collect().toSet == twice.collect().toSet)
    }
  }
}
