package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("languageId picks the language with most stopword hits") {
    val df = Seq(
      (1L, "the cat and the dog went to a house of cards"),
      (2L, "el gato y la casa de los amigos que juegan"),
      (3L, "le chat et les maisons des amis dans une ville"),
      (4L, "der hund und die katze das haus ist hier"))
      .toDF("id", "text")
    val out = df.select($"id", TextStats.languageId($"text").as("lang"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "en", 2L -> "es", 3L -> "fr", 4L -> "de"))
  }

  test("languageId tie prefers en > es > fr > de (deterministic)") {
    val df = Seq((1L, "no stopwords here whatsoever")).toDF("id", "text")
    assert(df.select(TextStats.languageId($"text")).as[String].head() == "en")
  }

  test("token counts: whitespace runs collapse; empty text counts one token") {
    val df = Seq((1L, "  a  b\tc "), (2L, "")).toDF("id", "text")
    val out = df.select($"id", TextStats.tokenCount($"text")).as[(Long, Long)]
      .collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 1L))
  }

  test("subwordCount splits letter runs, digit runs, and marks") {
    val df = Seq((1L, "spark4 rocks, v2.0!")).toDF("id", "text")
    // spark,4,rocks,",",v,2,".",0,"!" = 9
    assert(df.select(TextStats.subwordCount($"text")).as[Long].head() == 9L)
  }

  test("qualityScore is in [0,1] and rewards longer diverse text") {
    val df = Seq(
      (1L, "the of and to a " + (1 to 120).map(i => s"tok$i").mkString(" ")),
      (2L, "x x x x x"))
      .toDF("id", "text")
    val s = df.select($"id", TextStats.qualityScore($"text")).as[(Long, Double)]
      .collect().toMap
    assert(s.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(s(1L) > s(2L))
  }
}
