package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[BpeEncode]] parity against an independent naive reference
  * implementation (per-position linear scan over the whole vocabulary with
  * startsWith — a different algorithm from the expression's code-point
  * trie), plus hand cases pinning the semantics the oracle SQL replays:
  * longest-match-first, per-code-point unknown fallback, whitespace-word
  * boundaries identical to `split(trim(text), "\\s+")`.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: trim ASCII spaces, split on `\s+` keeping leading AND
    * trailing empty words (Spark StringSplit limit -1 semantics), then per
    * word repeatedly consume the longest vocab piece prefixing the rest
    * (ties impossible: equal-length prefixes of one string are equal). */
  private def naive(text: String, v: BpeVocab): Seq[Int] = {
    val trimmed = text.replaceAll("\\A +| +\\z", "")
    val words = trimmed.split("\\s+", -1).toSeq
    val out = scala.collection.mutable.ArrayBuffer[Int]()
    for (w <- words) {
      var i = 0
      while (i < w.length) {
        val rest = w.substring(i)
        val hits = v.pieces.zipWithIndex.filter(p => rest.startsWith(p._1))
        if (hits.nonEmpty) {
          val (p, id) = hits.maxBy(_._1.length)
          out += id
          i += p.length
        } else {
          out += BpeVocab.UnkId
          i += Character.charCount(w.codePointAt(i))
        }
      }
    }
    out.toSeq
  }

  private val corpus = Seq(
    "",
    "   ",
    "\t leading tab",
    "trailing tab \t",
    "a",
    "the",
    "theory",
    "customer window filter stream data",
    "the quick brown fox",
    "UPPER Case MiXeD",
    "nums 123 456.78 9,000 end",
    "punct !@# $%^ &*()",
    "unicode café naïve 中文 𐐀 mix",
    "line1\nline2\r\nline3",
    "x  vertical \f formfeed",
    ("window" * 10 + " ") * 5,
    (1 to 100).map(i => s"tok$i").mkString(" "))

  test("demo vocab: expression == naive reference on adversarial corpus") {
    val got = corpus.zipWithIndex.map(_.swap).toDF("id", "text")
      .select($"id", Bpe.encode($"text").as("ids"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Int](1))
      .toMap
    corpus.zipWithIndex.foreach { case (text, i) =>
      assert(got(i) == naive(text, BpeVocab.demo), s"text #$i: '$text'")
    }
  }

  test("demo vocab: expression == naive reference on seeded random text") {
    val rnd = new scala.util.Random(20260814L)
    // code-point alphabet (the supplementary 𐐀 as a unit, never a split
    // surrogate pair — lone surrogates are not valid UTF-8 input)
    val alphabet: IndexedSeq[String] =
      "aabcdeehinorstw \t\n中#%9 ".map(_.toString) :+ "𐐀"
    val texts = Seq.tabulate(200)(_ =>
      Seq.fill(rnd.nextInt(40))(
        alphabet(rnd.nextInt(alphabet.size))).mkString)
    val got = texts.zipWithIndex.map(_.swap).toDF("id", "text")
      .select($"id", Bpe.encode($"text").as("ids"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Int](1))
      .toMap
    texts.zipWithIndex.foreach { case (text, i) =>
      assert(got(i) == naive(text, BpeVocab.demo), s"random text #$i")
    }
  }

  test("longest match wins over greedy-shorter; unknown advances one cp") {
    val v = BpeVocab.demo
    def ids(s: String): Seq[Int] = {
      val out = scala.collection.mutable.ArrayBuffer[Int]()
      v.encodeWord(s, out)
      out.toSeq
    }
    assert(ids("the") == Seq(v.id("the"))) // not th + e
    assert(ids("data") == Seq(v.id("data"))) // not da + ta / d+a+t+a
    assert(ids("theory") == Seq(v.id("the"), v.id("or"), v.id("y")))
    assert(ids("Q") == Seq(BpeVocab.UnkId)) // uppercase not in demo vocab
    assert(ids("x中9") ==
      Seq(v.id("x"), BpeVocab.UnkId, v.id("9")))
  }

  test("custom vocab with multi-code-point and supplementary pieces") {
    val v = BpeVocab(Seq("中", "中文", "a", "ab", "𐐀"))
    val out = scala.collection.mutable.ArrayBuffer[Int]()
    v.encodeWord("中文ab𐐀q", out)
    assert(out.toSeq == Seq(1, 3, 4, BpeVocab.UnkId))
  }

  test("empty / whitespace-only text encodes to zero pieces") {
    val got = Seq("", "   ", " \t ").toDF("text")
      .select(Bpe.encode($"text").as("ids")).collect()
    got.foreach(r => assert(r.getSeq[Int](0).isEmpty))
  }

  test("oracle SQL generators cover every non-single length, quote safely") {
    val v = BpeVocab(Seq("a", "b'c", "xyz"))
    val adv = v.advanceCaseSql("w", "pos")
    assert(adv.contains("substr(w, pos, 3) IN ('xyz', 'b''c')") ||
      adv.contains("substr(w, pos, 3) IN ('b''c', 'xyz')"))
    assert(!adv.contains("substr(w, pos, 1)")) // singles fall to ELSE 1
    assert(v.valuesSql.contains("('b''c', 1)"))
  }
}
