package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSafeSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain inner join, hot keys included") {
    // hot key 1 on the big side (duplicated), plus unmatched rows both sides
    val big = (Seq.fill(50)((1L, "h")) ++
      Seq((2L, "x"), (3L, "y"), (9L, "orphan"))).toDF("k", "payload")
    val small = Seq((1L, "one"), (2L, "two"), (4L, "unused"))
      .toDF("k", "name")
    val got = SkewSafe.saltedJoin(big, small, Seq("k"), salts = 4)
      .select("k", "payload", "name").as[(Long, String, String)]
      .collect().sorted.toSeq
    val want = big.join(small, Seq("k"))
      .select("k", "payload", "name").as[(Long, String, String)]
      .collect().sorted.toSeq
    assert(got == want)
    assert(got.count(_._1 == 1L) == 50)
  }

  test("saltedJoin under a shuffle join partitions on (key, salt)") {
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val big = (1L to 100L).map(i => (i % 3, i)).toDF("k", "v")
      val small = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "name")
      val plan = SkewSafe.saltedJoin(big, small, Seq("k"), salts = 4)
        .queryExecution.executedPlan.toString
      assert(plan.contains("__salt"),
        s"expected the shuffle keys to include the salt:\n$plan")
    }
  }

  private def withSQLConf(kvs: (String, String)*)(f: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
