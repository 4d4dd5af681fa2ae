package graft.multimodal

import graft.functions.ByteHistogram
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque binary payload + typed metadata. */
final case class Asset(
    asset_id: Long, modality: String, content: Array[Byte],
    n_bytes: Long, source: String)

/** Fixed-width features a decoder produces per asset. */
final case class AssetFeatures(
    asset_id: Long, modality: String, width: Int, height: Int,
    n_frames: Int, feature: Array[Float])

/** Decoder boundary: the real implementation needs image/audio codecs that
  * are NOT in this container — implementations plug in here. The Spark-side
  * plumbing (schema, partitioning, batch shape) is real and tested either
  * way. */
trait AssetDecoder extends Serializable {
  def decode(a: Asset): AssetFeatures
}

/** STUB decoder — deterministic fake standing in for a real image/audio
  * decode (no codec libraries in this environment). Derives "dimensions"
  * from header bytes and a fixed-width feature vector from a byte histogram,
  * so every downstream shape (fixed dims, float features) is exercised with
  * verifiable values. */
object FakeDecoder extends AssetDecoder {
  override def decode(a: Asset): AssetFeatures = {
    val h = a.content.take(4).foldLeft(0)((acc, b) => acc * 31 + (b & 0xff))
    val hist = new Array[Float](16)
    a.content.foreach(b => hist(((b & 0xff) * 16) >>> 8) += 1f)
    val n = math.max(a.content.length, 1).toFloat
    AssetFeatures(a.asset_id, a.modality,
      width = 16 + math.abs(h % 64), height = 16 + math.abs((h / 64) % 64),
      n_frames = if (a.modality == "video") 1 + math.abs(h % 30) else 1,
      feature = hist.map(_ / n))
  }
}

/** Multimodal column handling over opaque binary payloads (SURVEY-extension:
  * the training-pipeline shapes — decode, feature-extract, sample — with the
  * decode step stubbed behind [[AssetDecoder]]).
  */
object Multimodal {

  /** Deterministic binary corpus derived from the documents table: UTF-8
    * payload + modality tag. Stands in for real image/audio/video blobs. */
  def syntheticAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("content"),
      length(col("text").cast("binary")).cast("long").as("n_bytes"),
      col("source"))

  /** Header metadata without decoding: byte length + hex magic prefix —
    * stays columnar/codegen'd (no decoder involved). */
  def extractMeta(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"), col("modality"), col("n_bytes"),
      substring(hex(col("content")), 1, 8).as("magic_hex"))

  /** Codegen'd byte-distribution features via the native
    * [[graft.functions.ByteHistogram]] expression (no UDF, no decode). */
  def byteFeatures(assets: DataFrame, buckets: Int = 16): DataFrame =
    assets.select(col("asset_id"), col("modality"),
      ByteHistogram.byteHistogram(col("content"), buckets).as("byte_hist"))

  /** Frame/chunk sampling: every `stride`-th fixed-size byte window, via
    * binary substring — the shape of video frame-sampling, pure columnar. */
  def sampleChunks(
      assets: DataFrame, chunkBytes: Int = 64, stride: Int = 4): DataFrame = {
    val step = chunkBytes.toLong * stride
    assets
      .withColumn("chunk_idx",
        explode(when(col("n_bytes") >= chunkBytes,
          sequence(lit(0L),
            ((col("n_bytes") - chunkBytes) / step).cast("long")))
          .otherwise(array().cast("array<bigint>"))))
      .select(col("asset_id"), col("chunk_idx"),
        expr(s"substring(content, CAST(chunk_idx * $step + 1 AS INT), $chunkBytes)")
          .as("chunk"))
  }

  /** Decode via the pluggable decoder: partition-parallel `mapPartitions`
    * over the typed Dataset (the Scala analog of a pandas-UDF batch loop —
    * the decoder sees one asset at a time, Spark keeps the partitioning). */
  def decodeFeatures(
      spark: SparkSession, assets: DataFrame,
      decoder: AssetDecoder = FakeDecoder): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions(_.map(decoder.decode))
  }

  /** Raw PCM extraction (audio modality): the decoder's imperative scope
    * ends at byte parsing — samples come back as an int array COLUMN, so
    * every downstream feature (frame energies, statistics) is Catalyst
    * array arithmetic, not UDF code. */
  def decodePcm(
      spark: SparkSession, assets: DataFrame): Dataset[AssetPcm] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions(_.map(WavDecoder.decodePcm))
  }

  /** Non-overlapping frame energies over an int-sample array: frame f is
    * `sum(s²)` over samples `[f·frame, min((f+1)·frame, n))` — the last
    * frame truncates. Samples are widened to LONG before squaring
    * (a full-scale PCM-16 value squares to 2^30; a frame of them needs the
    * wide accumulator), and the whole computation is per-row array math —
    * no shuffle, no UDF, parallel with the scan. */
  def frameEnergies(samples: Column, frame: Int): Column = {
    require(frame > 0, s"frameEnergies: frame must be positive, got $frame")
    when(size(samples) > 0,
      transform(
        // Column `/` is double division; values are non-negative so the
        // int cast truncates — exactly the floor the frame count needs
        sequence(lit(0), ((size(samples) - 1) / frame).cast("int")),
        f => aggregate(
          slice(samples, f * frame + 1, lit(frame)),
          lit(0L), (acc, s) => acc + s.cast("long") * s)))
      .otherwise(array().cast("array<bigint>"))
  }
}
