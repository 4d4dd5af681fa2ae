package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Subword (WordPiece-style) tokenization against a fixed vocabulary —
  * the "real token" counter a training pipeline budgets context windows
  * with, where the whitespace-token counts the rest of the text stack uses
  * are only a proxy.
  *
  * Semantics (deliberately engine-portable so an external SQL engine can
  * replay them exactly):
  *   - text splits into whitespace words first (identical tokenization to
  *     [[TextTokenAlgebra.tokenOffsets]] / `split(trim(text), "\\s+")`);
  *     subword pieces never cross a whitespace boundary;
  *   - within a word, repeated LONGEST-MATCH-FIRST: at each position the
  *     longest vocabulary piece matching there is consumed (ties are
  *     impossible — two distinct pieces of equal length cannot both equal
  *     the same substring); if none matches, ONE code point is consumed as
  *     the unknown token (id [[BpeVocab.UnkId]]);
  *   - matching is per Unicode CODE POINT (what `substr`/`len` count in
  *     ANSI SQL engines), not per byte or UTF-16 unit.
  *
  * Greedy longest-match is the deployment-side algorithm of the WordPiece
  * family (the training-side *merge learning* is offline and out of scope
  * for a query engine — vocabularies arrive as artifacts). It is a pure
  * per-row projection: at 100 TB it scales with corpus bytes, shuffles
  * nothing, and the vocabulary rides the serialized plan to executors
  * (for production vocabularies of ~100k pieces, the plan reference is
  * ~1–2 MB — the same order as a broadcast variable, shipped once per
  * executor by the task-serialization cache; the trie is rebuilt lazily
  * per JVM, never serialized).
  *
  * The reference pipeline has no tokenizer (its token columns are
  * whitespace counts); this extends SURVEY.md §2's text stack along the
  * training-data axis, same fused-native-expression pattern as
  * [[TextTokenExpressions]].
  */
final class BpeVocab private (val pieces: IndexedSeq[String])
    extends Serializable {
  import BpeVocab.UnkId

  require(pieces.nonEmpty, "empty vocabulary")
  require(pieces.distinct.size == pieces.size, "duplicate vocabulary pieces")
  require(pieces.forall(_.nonEmpty), "empty vocabulary piece")

  /** id of `piece` = its index in the (ordered) vocabulary. */
  def id(piece: String): Int = {
    val i = pieces.indexOf(piece)
    require(i >= 0, s"piece not in vocabulary: $piece")
    i
  }

  /** Code-point trie for longest-match: node 0 is the root; `next` maps
    * (node, codePoint) → node; `terminalId(node)` is the piece id ending
    * at that node, or -1. Built lazily per JVM (@transient — only the
    * piece list serializes). */
  @transient private lazy val trie: BpeVocab.Trie = {
    val t = new BpeVocab.Trie
    pieces.zipWithIndex.foreach { case (p, pid) => t.insert(p, pid) }
    t
  }

  /** Append the piece ids of `word` (one whitespace token, as UTF-16
    * String) to `out`. Longest-match-first; unknown code points emit
    * [[UnkId]]. */
  def encodeWord(word: String, out: scala.collection.mutable.ArrayBuffer[Int])
      : Unit = {
    var i = 0
    val len = word.length
    while (i < len) {
      val m = trie.longestMatch(word, i)
      if (m >= 0) {
        out += m
        i += pieces(m).length // piece length in UTF-16 units == chars here
      } else {
        out += UnkId
        i += Character.charCount(word.codePointAt(i))
      }
    }
  }

  /** Piece ids of the whole text: whitespace-split words encoded in
    * sequence (empty boundary tokens contribute nothing). Called from
    * generated code. */
  def encodeText(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val offs = TextTokenAlgebra.tokenOffsets(bytes)
    val n = offs.length / 2
    val out = new scala.collection.mutable.ArrayBuffer[Int](
      math.max(16, bytes.length / 3))
    var t = 0
    while (t < n) {
      val wl = offs(2 * t + 1) - offs(2 * t)
      if (wl > 0)
        encodeWord(
          UTF8String.fromBytes(bytes, offs(2 * t), wl).toString, out)
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  // ---- oracle-SQL generation (single source of truth is this vocab) -----

  private def sqlQuote(s: String) = "'" + s.replace("'", "''") + "'"

  /** Piece lengths descending, longest first, singles excluded (a 1-length
    * match and the unknown fallback both advance 1). */
  private def cpLen(p: String): Int = p.codePointCount(0, p.length)
  private def lengthsDesc: Seq[Int] =
    pieces.map(cpLen).filter(_ >= 2).distinct.sorted.reverse
  private def piecesOfLen(l: Int): Seq[String] =
    pieces.filter(p => cpLen(p) == l)

  /** Scalar SQL computing the longest-match ADVANCE (code points consumed)
    * at 1-based position `pos` of word `w` — a CASE over piece lengths,
    * longest first, so the recursive oracle CTE needs no join or aggregate
    * in its recursive term. A length-L probe `substr(w,pos,L) IN (…)` can
    * only hit length-L pieces (a shorter tail can't equal a length-L
    * string), so the first hit IS the longest match; no hit ⇒ advance 1
    * (single-char piece or unknown alike). */
  def advanceCaseSql(w: String, pos: String): String = {
    val whens = lengthsDesc.map { l =>
      val in = piecesOfLen(l).map(sqlQuote).mkString(", ")
      s"WHEN substr($w, $pos, $l) IN ($in) THEN $l"
    }
    if (whens.isEmpty) "1"
    else s"CASE ${whens.mkString(" ")} ELSE 1 END"
  }

  /** `(VALUES (piece, id), …)` rows for a `vocab(piece, id)` oracle CTE —
    * joined AFTER the recursion to map consumed pieces to ids (unknown
    * pieces miss the join; the caller coalesces to [[UnkId]]). */
  def valuesSql: String =
    pieces.zipWithIndex
      .map { case (p, i) => s"(${sqlQuote(p)}, $i)" }.mkString(", ")
}

object BpeVocab {
  /** Id emitted for a code point no piece covers. Outside every real id
    * (ids are non-negative vocab indexes). */
  final val UnkId: Int = -1

  def apply(pieces: Seq[String]): BpeVocab =
    new BpeVocab(pieces.toIndexedSeq)

  private[functions] final class Trie {
    // flat arrays would be faster still; a per-node HashMap keeps insert
    // trivial and lookup O(depth) with small constant — the demo vocab is
    // tiny and a 100k vocab's trie stays ~few MB per executor JVM
    private final class Node {
      val next = new java.util.HashMap[Integer, Node](4)
      var terminal: Int = -1
    }
    private val root = new Node

    def insert(piece: String, pid: Int): Unit = {
      var node = root
      var i = 0
      while (i < piece.length) {
        val cp = piece.codePointAt(i)
        var child = node.next.get(cp)
        if (child == null) { child = new Node; node.next.put(cp, child) }
        node = child
        i += Character.charCount(cp)
      }
      require(node.terminal < 0, s"duplicate piece: $piece")
      node.terminal = pid
    }

    /** Longest piece id matching `word` at UTF-16 index `from`, or -1. */
    def longestMatch(word: String, from: Int): Int = {
      var node = root
      var best = -1
      var i = from
      while (i < word.length && node != null) {
        val cp = word.codePointAt(i)
        node = node.next.get(cp)
        if (node != null) {
          i += Character.charCount(cp)
          if (node.terminal >= 0) best = node.terminal
        }
      }
      best
    }
  }

  /** The library's demo vocabulary (what ships when no trained artifact is
    * supplied, and what the oracle-gated queries pin): full single-char
    * coverage of [a-z0-9] so lowercase-ASCII corpora never hit the unknown
    * path, plus frequent English digraphs and longer merges that exercise
    * longest-match at every length tier. ORDER IS THE ID SPACE — append
    * only. */
  val demo: BpeVocab = BpeVocab(
    ("abcdefghijklmnopqrstuvwxyz0123456789".map(_.toString)) ++
      Seq(
        "th", "he", "er", "in", "an", "re", "on", "at", "or", "st",
        "ar", "ta", "ow", "ue", "me", "sh", "ba", "da", "li", "ne",
        "ro", "wi", "sm", "sl", "fa", "ke", "va", "gr", "pa", "so",
        "the", "ine", "rge", "can", "ort", "eam", "dow", "ata", "ery",
        "data", "ream", "mall", "ctor", "atch",
        "indow", "ilter", "olumn", "ustomer"))
}

/** `bpe_encode(text)` — ARRAY<INT> of subword piece ids (see [[BpeVocab]]).
  * Fused native expression: one pass over the document, no intermediate
  * token arrays; codegen calls straight into the vocab trie via a plan
  * reference object. */
case class BpeEncode(child: Expression, vocab: BpeVocab)
    extends StringInputExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    vocab.encodeText(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.addReferenceObj("bpeVocab", vocab, classOf[BpeVocab].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $v.encodeText($s);")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "bpe_encode"
}

object Bpe {
  def encode(text: Column, vocab: BpeVocab = BpeVocab.demo): Column =
    ColumnBridge.toColumn(BpeEncode(ColumnBridge.toExpression(text), vocab))
}
