package graft.text

import graft.SparkSpec
import graft.functions.{Bpe, BpeVocab}
import org.apache.spark.sql.functions._

/** BPE merge learning ([[BpeTrain]]): the distributed parity-rule rounds
  * must equal the classical sequential algorithm (leftmost-greedy merge,
  * count-DESC / pair-ASC tie-break) on any corpus — including runs of
  * identical symbols, where the parity rule earns its keep. */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference (Sennrich '16): the textbook trainer. */
  private def refBpe(words: Map[String, Long], k: Int)
      : Seq[(Long, String, String, String, Long)] = {
    val syms = scala.collection.mutable.Map(
      words.keys.map(w => w -> w.map(_.toString).toVector).toSeq: _*)
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    var r = 1
    var go = true
    while (r <= k && go) {
      val cnt = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (w, f) =>
        syms(w).sliding(2).filter(_.size == 2).foreach(p =>
          cnt((p(0), p(1))) = cnt.getOrElse((p(0), p(1)), 0L) + f)
      }
      if (cnt.isEmpty) go = false
      else {
        val ((a, b), c) = cnt.minBy { case ((x, y), n) => (-n, x, y) }
        out += ((r.toLong, a, b, a + b, c))
        words.keys.foreach { w =>
          val s = syms(w)
          val n = Vector.newBuilder[String]
          var i = 0
          while (i < s.size) {
            if (i + 1 < s.size && s(i) == a && s(i + 1) == b) {
              n += a + b; i += 2
            } else { n += s(i); i += 1 }
          }
          syms(w) = n.result()
        }
        r += 1
      }
    }
    out.result()
  }

  private def wordFreqs(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def fitPairs(texts: Seq[String], k: Int)
      : Seq[(Long, String, String, String, Long)] =
    BpeTrain.fit(texts.toDF("text"), "text", k)
      .orderBy("round")
      .as[(Long, String, String, String, Long)].collect().toSeq

  test("matches the sequential reference, including identical-symbol runs") {
    val texts = Seq(
      "aaaa aaaaa banana bandana low lower lowest newest widest",
      "the quick brown fox jumps over the lazy dog banana aaaa",
      "low low low lower newest newest widest aaa aaaaa")
    assert(fitPairs(texts, 6) == refBpe(wordFreqs(texts), 6))
  }

  test("property: random repeat-heavy corpora agree with the reference") {
    val rnd = new scala.util.Random(7)
    (0 until 4).foreach { _ =>
      val texts = (0 until 4).map(_ => (0 until (3 + rnd.nextInt(9)))
        .map(_ => (0 until (1 + rnd.nextInt(7)))
          .map(_ => "aabbc".charAt(rnd.nextInt(5))).mkString)
        .mkString(" "))
      assert(fitPairs(texts, 5) == refBpe(wordFreqs(texts), 5),
        s"corpus: $texts")
    }
  }

  test("dries out early when no adjacent pair remains") {
    val texts = Seq("a b c", "d e")
    assert(fitPairs(texts, 5).isEmpty)
    val one = Seq("ab ab cd")
    // two merge-able pairs total, then single symbols everywhere
    assert(fitPairs(one, 10).size == 2)
  }

  test("trained vocab feeds BpeEncode; parity with naive longest-match") {
    val texts = Seq(
      "lowest lower low newest new wide widest aaaa",
      "low low lowest newest banana ban band")
    val pieces = BpeTrain.vocabPieces(texts.toDF("text"), "text", 8)
    assert(pieces.nonEmpty && pieces.distinct.size == pieces.size)
    val vocab = BpeVocab(pieces)
    def naive(word: String): Seq[Int] = {
      val out = Seq.newBuilder[Int]
      var i = 0
      while (i < word.length) {
        val cands = pieces.zipWithIndex
          .filter { case (p, _) => word.startsWith(p, i) }
        if (cands.isEmpty) { out += BpeVocab.UnkId; i += 1 }
        else {
          val (p, pid) = cands.maxBy(_._1.length)
          out += pid; i += p.length
        }
      }
      out.result()
    }
    val words = texts.flatMap(_.split("\\s+")).distinct
    words.foreach { w =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
      vocab.encodeWord(w, buf)
      assert(buf.toSeq == naive(w), s"word $w")
    }
    // and through the Column surface over a DataFrame
    val viaCol = texts.toDF("text")
      .select(Bpe.encode(col("text"), vocab).as("ids"))
      .as[Seq[Int]].collect().toSeq
    val expect = texts.map(t =>
      t.trim.split("\\s+").filter(_.nonEmpty).toSeq.flatMap(naive))
    assert(viaCol == expect)
  }
}
