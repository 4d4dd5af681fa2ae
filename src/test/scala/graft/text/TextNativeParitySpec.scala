package graft.text

import graft.SparkSpec
import graft.functions.TextTokenExpressions._
import org.apache.spark.sql.functions._

/** The native fused expressions (TokenHash48 / ShingleHash48 / TextProfile)
  * must be bit-identical to the HOF forms they replaced — the HOF forms are
  * what the DuckDB oracles were originally validated against.
  */
class TextNativeParitySpec extends SparkSpec {
  import spark.implicits._

  // adversarial corpus: empty, all-space, leading/trailing tab, multi-space,
  // newlines, unicode (incl. supplementary plane), digits/punct mixes,
  // repeated shingles, stopwords in every case
  private val corpus = Seq(
    "",
    "   ",
    "\t leading tab",
    "trailing tab \t",
    "a",
    "a b",
    "a  b   c",
    "the quick brown fox the quick brown fox",
    "The THE tHe of AND to a",
    "el la de los que",
    "le les des et une",
    "der die das und ist",
    "line1\nline2\r\nline3",
    "nums 123 456.78 9,000 end",
    "punct !@# $%^ &*()",
    "unicode café naïve 中文 𐐀 mix",
    "x  vertical \f formfeed",
    "dup dup dup dup",
    ("w" * 50 + " ") * 30,
    (1 to 200).map(i => s"tok$i").mkString(" ")
  )

  private def df = corpus.zipWithIndex.map(_.swap).toDF("id", "text")

  test("TokenHash48 == transform(tokens, md5Hash48)") {
    val got = df.select($"id",
      tokenHash48($"text").as("n"),
      transform(TextFunctions.tokens($"text"), TextFunctions.md5Hash48(_))
        .as("h"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"token hash mismatch for text #${r.getInt(0)}")
    }
  }

  test("ShingleHash48 (ordered + distinct) == HOF wordShingles form") {
    for (k <- Seq(2, 3, 5)) {
      val got = df.select($"id",
        shingleHash48($"text", k, distinct = false).as("n"),
        transform(TextFunctions.wordShingles($"text", k),
          TextFunctions.md5Hash48(_)).as("h"),
        shingleHash48($"text", k, distinct = true).as("nd"),
        transform(array_distinct(TextFunctions.wordShingles($"text", k)),
          TextFunctions.md5Hash48(_)).as("hd"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"k=$k #${r.getInt(0)}")
        assert(r.getSeq[Long](3) == r.getSeq[Long](4),
          s"distinct k=$k #${r.getInt(0)}")
      }
    }
  }

  test("TextProfile fields == the five HOF stat columns") {
    val toksLower = transform(TextFunctions.tokens($"text"), lower(_))
    val hofCols = Seq(
      TextStats.hofTokenCount($"text"),
      TextStats.hofDistinctTokenCount($"text"),
      TextStats.hofSubwordCount($"text")) ++
      TextStats.stopwords.map { case (_, ws) =>
        TextStats.hofStopwordHits(toksLower, ws)
      }
    val nativeCols = Seq(
      TextStats.tokenCount($"text"),
      TextStats.distinctTokenCount($"text"),
      TextStats.subwordCount($"text")) ++
      TextStats.stopwords.map { case (l, _) =>
        TextStats.stopwordHitsFor($"text", l)
      }
    val got = df.select($"id" +: (nativeCols ++ hofCols): _*).collect()
    got.foreach { r =>
      (1 to 7).foreach { i =>
        assert(r.getLong(i) == r.getLong(i + 7),
          s"profile field $i mismatch for text #${r.getInt(0)}: " +
            s"native=${r.getLong(i)} hof=${r.getLong(i + 7)}")
      }
    }
  }

  test("native expressions run inside whole-stage codegen (plan check)") {
    // range-backed (a local relation would constant-fold the projection away)
    val r = spark.range(10)
      .select(concat(lit("a b c "), $"id".cast("string")).as("text"))
    val q = r.select(tokenHash48($"text"), textProfile($"text"),
      shingleHash48($"text", 3, distinct = true))
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("token_hash48")), plan)
    assert(q.collect().length == 10)
  }
}
