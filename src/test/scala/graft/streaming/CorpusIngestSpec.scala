package graft.streaming

import graft.SparkSpec
import graft.storage.{CowTable, TableConfig}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

class CorpusIngestSpec extends SparkSpec {
  import spark.implicits._

  /** Comfortably above the 0.55 quality bar: long, diverse, stopword-y. */
  private def goodText(seed: Int): String =
    "the a of and to " + (1 to 100).map(i => s"w${seed}x$i").mkString(" ")

  /** Far below any reasonable bar: short, repetitive. */
  private val junkText = "a a a a a"

  private def freshTable(name: String): CowTable =
    CowTable(spark, tmpDir(name) + "/table",
      TableConfig("corpus_spec", Seq("text_hash")))

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def state(t: CowTable): Map[Long, Long] =
    t.read().select("text_hash", "doc_id")
      .as[(Long, Long)].collect().toMap // hash -> winning doc_id

  test("cross-batch conflicts converge to min doc_id regardless of order") {
    val a = docsDf(10L -> goodText(1))
    val b = docsDf(5L -> goodText(1))
    val t1 = freshTable("ci-ab")
    CorpusIngest.applyBatch(t1, a, 0.55)
    CorpusIngest.applyBatch(t1, b, 0.55)
    val t2 = freshTable("ci-ba")
    CorpusIngest.applyBatch(t2, b, 0.55)
    CorpusIngest.applyBatch(t2, a, 0.55)
    assert(state(t1) == state(t2))
    assert(state(t1).values.toSet == Set(5L))
  }

  test("a later larger id never replaces the incumbent (idempotent too)") {
    val t = freshTable("ci-keep")
    CorpusIngest.applyBatch(t, docsDf(10L -> goodText(2)), 0.55)
    val v1 = t.currentVersion
    CorpusIngest.applyBatch(t, docsDf(20L -> goodText(2)), 0.55)
    assert(state(t).values.toSet == Set(10L))
    // replaying the winning row is also a no-op commit-wise (same key,
    // same winner row content ⇒ upsert rewrites the touched file only)
    CorpusIngest.applyBatch(t, docsDf(10L -> goodText(2)), 0.55)
    assert(state(t).values.toSet == Set(10L))
    assert(v1 >= 1)
  }

  test("quality filter drops junk; in-batch duplicates dedup to min id") {
    val t = freshTable("ci-q")
    CorpusIngest.applyBatch(t, docsDf(
      1L -> junkText, // filtered
      7L -> goodText(3), 3L -> goodText(3), // same text: 3 wins
      9L -> goodText(4)), 0.55)
    assert(state(t).values.toSet == Set(3L, 9L))
  }

  test("an all-filtered batch leaves the table untouched") {
    val t = freshTable("ci-empty")
    CorpusIngest.applyBatch(t, docsDf(2L -> goodText(5)), 0.55)
    val v = t.currentVersion
    assert(CorpusIngest.applyBatch(t, docsDf(4L -> junkText), 0.55) == v)
  }

  test("streamed multi-batch ingest equals one-shot batch apply; " +
    "checkpoint replay is a no-op") {
    val rows = (1L to 40L).map(i => (i, goodText((i % 9).toInt))) :+
      (99L, junkText)
    val base = tmpDir("ci-stream")
    rows.toDF("doc_id", "text").repartition(5)
      .write.mode("overwrite").parquet(base + "/src")
    val schema = new StructType().add("doc_id", "long").add("text", "string")

    val streamed = CowTable(spark, base + "/t1",
      TableConfig("corpus_spec", Seq("text_hash")))
    CorpusIngest.runAvailableNow(spark, streamed, base + "/src",
      base + "/ckpt", schema, 0.55, maxFilesPerTrigger = 1)

    val oneShot = CowTable(spark, base + "/t2",
      TableConfig("corpus_spec", Seq("text_hash")))
    CorpusIngest.applyBatch(oneShot, rows.toDF("doc_id", "text"), 0.55)

    assert(state(streamed) == state(oneShot))
    assert(state(streamed).size == 9) // 9 distinct texts, junk filtered

    // drained checkpoint: a second run sees no new files, commits nothing
    val v = streamed.currentVersion
    CorpusIngest.runAvailableNow(spark, streamed, base + "/src",
      base + "/ckpt", schema, 0.55, maxFilesPerTrigger = 1)
    assert(streamed.currentVersion == v)
  }
}
