package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Seeded-generator property tests: AsOfJoin and RangeJoin must agree with
  * brute-force reference implementations on arbitrary event sets (ties,
  * boundaries, empty sides, multi-user interleavings). Same fixed-seed
  * pattern as CdcDedupProperties (no scalatest-scalacheck bridge offline;
  * Spark jobs per case bound the case count). */
class TemporalOpsProperties extends SparkSpec {
  import spark.implicits._

  // (user, eventId, epochSecond) — coarse ts range forces collisions/ties
  private val rowGen = for {
    user <- Gen.choose(0L, 2L)
    id <- Gen.choose(0L, 999L)
    sec <- Gen.choose(0L, 30L)
  } yield (user, id, sec)

  private def cases(n: Int): Seq[List[(Long, Long, Long)]] =
    (1 to n).flatMap(i =>
      Gen.nonEmptyListOf(rowGen).map(_.take(30).distinctBy(_._2))
        .apply(Gen.Parameters.default, Seed(i.toLong)))

  private def df(rows: List[(Long, Long, Long)]) =
    rows.toDF("user_id", "event_id", "sec")
      .selectExpr("user_id", "event_id",
        "timestamp_seconds(sec) AS ts")

  test("asof agrees with the brute-force latest-at-or-before search") {
    for (rows <- cases(6)) {
      val (l, r) = rows.partition(_._2 % 2 == 0)
      if (l.nonEmpty && r.nonEmpty) {
        val got = AsOfJoin.backward(df(l), df(r), Seq("user_id"), "ts",
          "event_id", Seq("event_id" -> "match_id"))
          .select("event_id", "match_id")
          .collect().map(x => x.getLong(0) ->
            (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
        val want = l.map { case (u, id, sec) =>
          val c = r.filter(x => x._1 == u && x._3 <= sec)
          id -> (if (c.isEmpty) None
                 else Some(c.maxBy(x => (x._3, x._2))._2))
        }.toMap
        assert(got == want, s"left=$l right=$r")
      }
    }
  }

  test("range join agrees with the brute-force interval filter") {
    for (rows <- cases(6)) {
      val (l, r) = rows.partition(_._2 % 2 == 0)
      if (l.nonEmpty && r.nonEmpty) {
        val got = RangeJoin.bucketed(df(l), df(r), Seq("user_id"),
          "ts", "ts", lowerSec = -7L, upperSec = 3L,
          payload = Seq("event_id" -> "match_id"))
          .select("event_id", "match_id")
          .as[(Long, Long)].collect().toSet
        val want = (for {
          (u, id, sec) <- l
          (ru, rid, rsec) <- r
          if ru == u && rsec >= sec - 7 && rsec <= sec + 3
        } yield (id, rid)).toSet
        assert(got == want, s"left=$l right=$r")
      }
    }
  }
}
