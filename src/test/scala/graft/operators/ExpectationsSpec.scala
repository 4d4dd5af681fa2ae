package graft.operators

import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    "positive" -> "v > 0",
    "named" -> "name IS NOT NULL AND name <> ''")

  private val df = Seq(
    (1L, Some(5.0), Some("ok")), // clean
    (2L, Some(-1.0), Some("ok")), // fails positive
    (3L, Some(5.0), None), // fails named
    (4L, None, Some("")), // fails BOTH — null v fails like false
    (5L, Some(0.5), Some("x")) // clean
  ).toDF("id", "v", "name")

  test("split partitions the input; NULL fails like false") {
    val (good, bad) = Expectations.split(df, rules)
    assert(good.select("id").as[Long].collect().toSet == Set(1L, 5L))
    val q = bad.select($"id", $"_failed_expectations")
      .as[(Long, Seq[String])].collect().toMap
    assert(q == Map(
      2L -> Seq("positive"),
      3L -> Seq("named"),
      4L -> Seq("positive", "named"))) // rule declaration order
    assert(good.count() + bad.count() == df.count())
  }

  test("tagging is one shuffle-free projection") {
    val plan = Expectations.tag(df, rules)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
  }

  test("metrics: one row per rule, sole-failure triage counter") {
    val m = Expectations.metrics(df, rules)
      .as[(String, Long, Long, Long)].collect().toSeq
    // id2 fails only positive, id3 only named, id4 both (sole on neither)
    assert(m == Seq(("positive", 2L, 3L, 1L), ("named", 2L, 3L, 1L)))
  }

  test("metrics on empty input: zero rows, all-zero counters") {
    val m = Expectations.metrics(df.filter($"id" < 0), rules)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(m == Seq(("positive", 0L, 0L, 0L), ("named", 0L, 0L, 0L)))
  }

  test("bad rule sets are loud") {
    intercept[IllegalArgumentException](Expectations.tag(df, Nil))
    intercept[IllegalArgumentException](
      Expectations.tag(df, Seq("a" -> "v > 0", "a" -> "v < 9")))
  }

  test("quarantineIngest: repaired rows move, broken rows re-quarantine") {
    import graft.storage.{CowTable, TableConfig}
    val dir = tmpDir("expq")
    val main = CowTable(spark, dir + "/m", TableConfig("m", Seq("id")))
    val quar = CowTable(spark, dir + "/q", TableConfig("q", Seq("id")))
    def ids(t: CowTable): Set[Long] =
      t.read().select("id").as[Long].collect().toSet
    val (c1, q1) = Expectations.quarantineIngest(main, quar, df, rules)
    assert((c1, q1) == (2L, 3L))
    assert(ids(main) == Set(1L, 5L) && ids(quar) == Set(2L, 3L, 4L))
    // 3 re-delivered repaired → moves to main, ghost deleted;
    // 2 re-delivered still broken → stays quarantined, audit refreshed
    val b2 = Seq(
      (3L, Some(5.0), Some("fixed")), (2L, Some(-2.0), Some("ok")))
      .toDF("id", "v", "name")
    val (c2, q2) = Expectations.quarantineIngest(main, quar, b2, rules)
    assert((c2, q2) == (1L, 1L))
    assert(ids(main) == Set(1L, 3L, 5L) && ids(quar) == Set(2L, 4L))
    val audit = quar.read().select($"id", $"failed_rules")
      .as[(Long, String)].collect().toMap
    assert(audit == Map(2L -> "positive", 4L -> "positive,named"))
  }
}
