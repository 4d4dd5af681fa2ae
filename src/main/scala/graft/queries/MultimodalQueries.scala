package graft.queries

import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.core.{Q, Tables}
import graft.multimodal.Multimodal
import graft.storage.{CowTable, TableConfig}
import graft.streaming.CdcStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming CDC + multimodal binary-column coverage. q46 replays the q27
  * pipeline through Structured Streaming (file-source checkpoint = bookmark,
  * Trigger.AvailableNow, two time-ordered micro-batches) and must converge
  * to the same oracle state. q47 exercises binary payload metadata with a
  * DuckDB BLOB oracle; q48 (byte-distribution features via the native
  * ByteHistogram expression) is structural — rows-only check + spec.
  */
object MultimodalQueries {
  import StorageQueries.{tableDir, cdcOracleSql, initialSnapshot, cdcBatch, auditTs}

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.table(s, d, "documents")

  private def listParquet(dir: String): Seq[Path] =
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq

  val all: Seq[Q] = Seq(

    // Streaming CDC: same initial snapshot + CDC log as q27, split into two
    // time-ordered files consumed as separate micro-batches (mtime order,
    // maxFilesPerTrigger=1) — must converge to the q27 oracle state.
    Q("q46_stream_cdc", cdcOracleSql) { (s, d) =>
      val base = tableDir("q46")
      CowTable.deleteRecursively(Paths.get(base))
      val tbl = CowTable.replace(s, base + "/table",
        TableConfig("user_state", Seq("user_id"),
          precombineKey = Some("event_id")),
        initialSnapshot(s, d))
      val cdc = cdcBatch(s, d)
      val mid = lit("2024-01-22 00:00:00").cast("timestamp")
      val cdcDir = base + "/cdc"
      cdc.filter(col("timestamp") < mid)
        .coalesce(1).write.mode("append").parquet(cdcDir)
      val batch1Files = listParquet(cdcDir)
      batch1Files.foreach(p =>
        Files.setLastModifiedTime(p, FileTime.fromMillis(1000000000000L)))
      cdc.filter(col("timestamp") >= mid)
        .coalesce(1).write.mode("append").parquet(cdcDir)
      listParquet(cdcDir).filterNot(batch1Files.contains).foreach(p =>
        Files.setLastModifiedTime(p, FileTime.fromMillis(1000000600000L)))
      CdcStream.runAvailableNow(s, tbl, cdcDir, base + "/ckpt", cdc.schema,
        auditTs = lit(auditTs).cast("timestamp"))
      tbl.read()
    },

    // Binary payload metadata (no decode): byte length + hex magic prefix.
    Q("q47_binary_meta",
      """SELECT doc_id AS asset_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |       WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  substr(hex(CAST(text AS BLOB)), 1, 8) AS magic_hex
        |FROM documents
        |""".stripMargin) { (s, d) =>
      Multimodal.extractMeta(Multimodal.syntheticAssets(docs(s, d)))
    },

    // FRAME SAMPLING (the video frame-sample shape, pure columnar): every
    // stride-th fixed-size byte window of the payload via binary substring —
    // no decode, no UDF. The oracle replays the identical byte windows in
    // SQL; the testdata text is pure ASCII (verified: octet_length == length
    // on every row), so DuckDB's char-based substring is byte-exact against
    // Spark's byte-based binary substring — a future non-ASCII regeneration
    // would fail the gate loudly, never silently.
    Q("q119_frame_sample",
      """WITH a AS (SELECT doc_id AS asset_id, text, length(text) AS n
        |           FROM documents),
        |c AS (SELECT asset_id, text,
        |        unnest(range(0, CAST((n - 64) // 256 AS BIGINT) + 1))
        |          AS chunk_idx
        |      FROM a WHERE n >= 64)
        |SELECT asset_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  hex(substring(text, CAST(chunk_idx * 256 + 1 AS BIGINT), 64))
        |    AS chunk_hex
        |FROM c
        |""".stripMargin) { (s, d) =>
      Multimodal.sampleChunks(
        Multimodal.syntheticAssets(docs(s, d)), chunkBytes = 64, stride = 4)
        .select(col("asset_id"), col("chunk_idx"),
          hex(col("chunk")).as("chunk_hex"))
    },

    // REAL decode through the pluggable boundary: synthesized RIFF/WAVE
    // PCM-16 containers (closed-form samples keyed by doc_id) parsed back by
    // WavDecoder — magic/chunk-walk/fmt/sample extraction are genuine byte
    // parsing, and the oracle independently replays the closed form in SQL
    // (header fields + exact 8-bin sample histogram; zero bins filtered).
    Q("q84_decode_wav",
      """WITH s AS (SELECT doc_id AS asset_id,
        |    CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
        |    CAST(64 + doc_id % 64 AS INT) AS n_samples
        |  FROM documents),
        |sam AS (SELECT asset_id, sample_rate, n_samples,
        |    (asset_id * 31 + t.i * 7) % 65536 - 32768 AS v
        |  FROM s, UNNEST(generate_series(0, n_samples - 1)) AS t(i))
        |SELECT asset_id, sample_rate, n_samples,
        |  CAST((v + 32768) // 8192 AS INT) AS bin,
        |  count(*) AS n
        |FROM sam GROUP BY 1, 2, 3, 4
        |""".stripMargin) { (s, d) =>
      val assets = graft.multimodal.WavFixtures
        .syntheticWavs(s, docs(s, d)).toDF()
      Multimodal.decodeFeatures(s, assets, graft.multimodal.WavDecoder)
        .toDF()
        .select(col("asset_id"), col("width").as("sample_rate"),
          col("n_frames").as("n_samples"),
          posexplode(col("feature")).as(Seq("bin", "n")))
        .filter(col("n") > 0)
        .select(col("asset_id"), col("sample_rate"), col("n_samples"),
          col("bin"), col("n").cast("long").as("n"))
    },

    // SECOND DECODED MODALITY through the same AssetDecoder seam: real
    // 24-bit BMP container parsing (magic, header fields, row stride +
    // padding walk) over deterministic closed-form fixtures — the oracle
    // regenerates every pixel channel byte from the same formula and
    // re-counts the 8-bin histogram, an independent replay of the decode.
    Q("q126_decode_bmp",
      """WITH s AS (SELECT doc_id AS asset_id,
        |    CAST(4 + doc_id % 13 AS INT) AS width,
        |    CAST(2 + doc_id % 7 AS INT) AS height
        |  FROM documents),
        |px AS (SELECT asset_id, width, height,
        |    (asset_id * 13 + x.i * 7 + y.j * 5 + c.k * 3) % 256 AS v
        |  FROM s,
        |    UNNEST(generate_series(0, width - 1)) AS x(i),
        |    UNNEST(generate_series(0, height - 1)) AS y(j),
        |    UNNEST(generate_series(0, 2)) AS c(k))
        |SELECT asset_id, width, height,
        |  CAST(v // 32 AS INT) AS bin, count(*) AS n
        |FROM px GROUP BY 1, 2, 3, 4
        |""".stripMargin) { (s, d) =>
      val assets = graft.multimodal.BmpFixtures
        .syntheticBmps(s, docs(s, d)).toDF()
      Multimodal.decodeFeatures(s, assets, graft.multimodal.BmpDecoder)
        .toDF()
        .select(col("asset_id"), col("width"), col("height"),
          posexplode(col("feature")).as(Seq("bin", "n")))
        .filter(col("n") > 0)
        .select(col("asset_id"), col("width"), col("height"),
          col("bin"), col("n").cast("long").as("n"))
    },

    // AUDIO FRAME ENERGY: real WAV decode to raw PCM samples (decoder seam
    // ends at byte parsing), then per-frame sum-of-squares as COLUMNAR
    // array math — 32-sample non-overlapping frames, last frame truncated.
    // Integer-exact (PCM-16 squares, LONG accumulator), so the oracle
    // regenerates every sample from the fixture's closed form and re-sums.
    Q("q131_frame_energy",
      """WITH s AS (SELECT doc_id AS asset_id,
        |    CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
        |    CAST(64 + doc_id % 64 AS INT) AS n_samples
        |  FROM documents),
        |sam AS (SELECT asset_id, sample_rate, n_samples,
        |    t.i // 32 AS frame_idx,
        |    (asset_id * 31 + t.i * 7) % 65536 - 32768 AS v
        |  FROM s, UNNEST(generate_series(0, n_samples - 1)) AS t(i))
        |SELECT asset_id, sample_rate, n_samples,
        |  CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(count(*) AS BIGINT) AS n_frame_samples,
        |  CAST(sum(v * v) AS BIGINT) AS energy
        |FROM sam GROUP BY 1, 2, 3, 4
        |""".stripMargin) { (s, d) =>
      val assets = graft.multimodal.WavFixtures
        .syntheticWavs(s, docs(s, d)).toDF()
      Multimodal.decodePcm(s, assets).toDF()
        .select(col("asset_id"), col("sample_rate"), col("n_samples"),
          posexplode(Multimodal.frameEnergies(col("samples"), frame = 32))
            .as(Seq("frame_idx", "energy")))
        .withColumn("n_frame_samples",
          least(col("n_samples") - col("frame_idx") * 32, lit(32))
            .cast("long"))
        .select("asset_id", "sample_rate", "n_samples", "frame_idx",
          "n_frame_samples", "energy")
    },

    // Byte-distribution features through the native codegen'd expression —
    // exploded to scalars. With 16 buckets the bucket of a byte is exactly
    // its high nibble, so the oracle counts each hex digit at the odd
    // positions of hex(blob) — an independent SQL replay of per-byte work.
    Q("q48_byte_features",
      """WITH a AS (SELECT doc_id AS asset_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |         WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |    hex(CAST(text AS BLOB)) AS hx,
        |    octet_length(CAST(text AS BLOB)) AS n
        |  FROM documents)
        |SELECT asset_id, modality, CAST(b.bucket AS INT) AS bucket,
        |  CAST(len(list_filter(range(0, n),
        |    i -> substr(hx, CAST(2*i+1 AS INT), 1) =
        |         substr('0123456789ABCDEF', CAST(b.bucket+1 AS INT), 1)))
        |    AS BIGINT) AS n_bytes_in_bucket
        |FROM a, (SELECT unnest(range(0, 16)) AS bucket) b
        |""".stripMargin) { (s, d) =>
      Multimodal.byteFeatures(Multimodal.syntheticAssets(docs(s, d)))
        .select(col("asset_id"), col("modality"),
          posexplode(col("byte_hist")).as(Seq("bucket", "n_bytes_in_bucket")))
    })
}
