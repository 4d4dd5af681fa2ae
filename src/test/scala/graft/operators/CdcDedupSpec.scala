package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame

class CdcDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def cdc(rows: (Long, String, String, Long)*): DataFrame =
    rows.toSeq.toDF("id", "ts_s", "op", "seq")
      .selectExpr("id", "CAST(ts_s AS TIMESTAMP) AS ts", "op", "seq")

  test("latestPerKey keeps only max-timestamp rows per key") {
    val df = cdc(
      (1L, "2024-01-01 00:00:00", "I", 1L),
      (1L, "2024-01-02 00:00:00", "U", 2L),
      (2L, "2024-01-01 00:00:00", "I", 3L))
    val out = CdcDedup.latestPerKey(df, Seq("id"), "ts")
      .select("id", "op").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "U"), (2L, "I")))
  }

  test("latestPerKey KEEPS tied rows (the reference's no-precombine behavior)") {
    val df = cdc(
      (1L, "2024-01-02 00:00:00", "U", 1L),
      (1L, "2024-01-02 00:00:00", "D", 2L),
      (1L, "2024-01-01 00:00:00", "I", 3L))
    val out = CdcDedup.latestPerKey(df, Seq("id"), "ts")
    assert(out.count() == 2)
    assert(out.select("op").as[String].collect().toSet == Set("U", "D"))
  }

  test("latestPerKeyStrict breaks ties on precombine desc, exactly one row") {
    val df = cdc(
      (1L, "2024-01-02 00:00:00", "U", 5L),
      (1L, "2024-01-02 00:00:00", "D", 9L),
      (1L, "2024-01-01 00:00:00", "I", 7L))
    val out = CdcDedup.latestPerKeyStrict(df, Seq("id"), "ts", Seq("seq"))
      .select("id", "op", "seq").as[(Long, String, Long)].collect()
    assert(out.toSeq == Seq((1L, "D", 9L)))
  }

  test("latestPerKeyStrict is deterministic across repeated runs") {
    val df = cdc((1L to 50L).flatMap(i =>
      Seq((i % 5, "2024-01-02 00:00:00", "U", i),
        (i % 5, "2024-01-02 00:00:00", "D", i + 100))): _*)
    val runs = (1 to 3).map(_ =>
      CdcDedup.latestPerKeyStrict(df, Seq("id"), "ts", Seq("seq"))
        .select("id", "seq").as[(Long, Long)].collect().sortBy(_._1).toSeq)
    assert(runs.distinct.size == 1)
    // every key resolves to its max seq
    assert(runs.head.forall { case (_, seq) => seq > 100 })
  }

  test("null keys group together (null-safe, not dropped)") {
    val df = Seq(
      (Option.empty[Long], "2024-01-01 00:00:00", "I", 1L),
      (Option.empty[Long], "2024-01-02 00:00:00", "U", 2L),
      (Some(1L), "2024-01-01 00:00:00", "I", 3L))
      .toDF("id", "ts_s", "op", "seq")
      .selectExpr("id", "CAST(ts_s AS TIMESTAMP) AS ts", "op", "seq")
    val out = CdcDedup.latestPerKey(df, Seq("id"), "ts")
    assert(out.count() == 2)
    assert(out.filter("id IS NULL").select("op").as[String].head() == "U")
  }

  test("opCounts is a single-pass exact per-op histogram") {
    val df = cdc(
      (1L, "2024-01-01 00:00:00", "I", 1L),
      (2L, "2024-01-01 00:00:00", "I", 2L),
      (3L, "2024-01-01 00:00:00", "U", 3L),
      (4L, "2024-01-01 00:00:00", "D", 4L))
    assert(CdcDedup.opCounts(df, "op") == Map("I" -> 2L, "U" -> 1L, "D" -> 1L))
  }
}
