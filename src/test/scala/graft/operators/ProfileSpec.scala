package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), Some(10)),
    (2L, None, Some(20)),
    (3L, Some("b"), None),
    (4L, Some("a"), Some(20))
  ).toDF("id", "tag", "v")

  test("per-column counts, nulls, distincts, min/max in one pass") {
    val out = Profile.profile(df, Seq("id", "tag", "v"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("id") == (("id", 4L, 0L, 4L, Some("1"), Some("4"))))
    assert(out("tag") == (("tag", 4L, 1L, 2L, Some("a"), Some("b"))))
    assert(out("v") == (("v", 4L, 1L, 2L, Some("10"), Some("20"))))
  }

  test("min/max aggregate in the native type before stringifying") {
    // numeric 9 < 10 even though '9' > '10' lexicographically
    val n = Seq(9, 10, 100).toDF("x")
    val r = Profile.profile(n, Seq("x"))
      .selectExpr("min_value", "max_value").as[(String, String)].head()
    assert(r == (("9", "100")))
  }

  test("unknown or empty column lists are rejected") {
    intercept[IllegalArgumentException] { Profile.profile(df, Nil) }
    intercept[IllegalArgumentException] {
      Profile.profile(df, Seq("id", "nope"))
    }
  }
}
