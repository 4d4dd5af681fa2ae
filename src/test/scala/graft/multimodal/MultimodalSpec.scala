package graft.multimodal

import graft.SparkSpec
import graft.functions.ByteHistogram
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "hello world", "en", "s1", 11L),
    (2L, "abc", "en", "s1", 3L),
    (3L, "", "en", "s2", 0L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("syntheticAssets: binary payload round-trips the UTF-8 bytes") {
    val a = Multimodal.syntheticAssets(docs)
    val row = a.filter($"asset_id" === 1L).head()
    assert(row.getAs[Array[Byte]]("content").toSeq ==
      "hello world".getBytes("UTF-8").toSeq)
    assert(row.getAs[Long]("n_bytes") == 11L)
    assert(Set("image", "audio", "video")(row.getAs[String]("modality")))
  }

  test("extractMeta: hex magic prefix of the payload header") {
    val m = Multimodal.extractMeta(Multimodal.syntheticAssets(docs))
      .filter($"asset_id" === 1L).head()
    assert(m.getAs[String]("magic_hex") == "68656C6C") // 'hell'
  }

  test("ByteHistogram native expression matches a reference histogram") {
    val a = Multimodal.syntheticAssets(docs)
    val hist = Multimodal.byteFeatures(a, 16)
      .filter($"asset_id" === 1L).select("byte_hist").as[Seq[Long]].head()
    val expected = new Array[Long](16)
    "hello world".getBytes("UTF-8").foreach(b =>
      expected(((b & 0xff) * 16) >>> 8) += 1L)
    assert(hist == expected.toSeq)
    assert(hist.sum == 11L)
  }

  test("ByteHistogram participates in codegen (no fallback) and SQL registration works") {
    ByteHistogram.register(spark)
    Multimodal.syntheticAssets(docs).createOrReplaceTempView("assets_t")
    val viaSql = spark.sql(
      "SELECT byte_histogram(content, 16) AS h FROM assets_t WHERE asset_id = 1")
      .as[Seq[Long]].head()
    assert(viaSql.sum == 11L)
    // a LocalTableScan alone never codegens — force a real projection stage,
    // and execute first so AQE finalizes the plan
    val df = Multimodal.byteFeatures(
      Multimodal.syntheticAssets(docs).repartition(2))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // "*(n) Project" is the whole-stage-codegen marker in plan strings
    assert(plan.split("\n").exists(l =>
      l.contains("Project") && l.contains("*(")), plan)
    // and the expression itself is a real doGenCode impl, not a fallback
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import org.apache.spark.sql.graftshim.ColumnBridge
    assert(!ByteHistogram(
      ColumnBridge.toExpression(lit(Array[Byte](1))), 16)
      .isInstanceOf[CodegenFallback])
  }

  test("sampleChunks: fixed-size windows at stride, none for short payloads") {
    val a = Multimodal.syntheticAssets(
      Seq((1L, "x" * 300, "en", "s", 300L), (2L, "short", "en", "s", 5L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val chunks = Multimodal.sampleChunks(a, chunkBytes = 64, stride = 2)
      .select("asset_id", "chunk_idx").as[(Long, Long)].collect()
    // 300 bytes, window 64, step 128: idx 0 (bytes 0-63) and 1 (128-191)
    assert(chunks.filter(_._1 == 1L).map(_._2).sorted.toSeq == Seq(0L, 1L))
    assert(!chunks.exists(_._1 == 2L))
    val c0 = Multimodal.sampleChunks(a, 64, 2).filter($"asset_id" === 1L &&
      $"chunk_idx" === 0L).select("chunk").head().getAs[Array[Byte]](0)
    assert(c0.length == 64)
  }

  test("decodeFeatures: deterministic fake decode with fixed-width features") {
    val f1 = Multimodal.decodeFeatures(spark,
      Multimodal.syntheticAssets(docs).filter($"asset_id" <= 2L)).collect()
    val f2 = Multimodal.decodeFeatures(spark,
      Multimodal.syntheticAssets(docs).filter($"asset_id" <= 2L)).collect()
    assert(f1.map(_.asset_id).sorted.toSeq == Seq(1L, 2L))
    assert(f1.forall(_.feature.length == 16))
    assert(f1.forall(f => f.width >= 16 && f.height >= 16))
    // determinism across runs
    assert(f1.sortBy(_.asset_id).map(_.feature.toSeq).toSeq ==
      f2.sortBy(_.asset_id).map(_.feature.toSeq).toSeq)
  }
}
