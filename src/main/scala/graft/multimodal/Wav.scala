package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** A REAL decoder behind the [[AssetDecoder]] boundary: RIFF/WAVE PCM-16.
  * WAV needs no codec library — the container is a chunked header over raw
  * little-endian samples — so this replaces the FakeDecoder stand-in for the
  * audio modality with genuine byte-level parsing (magic validation, chunk
  * walk, fmt block, interleaved sample extraction).
  *
  * Feature mapping into the fixed [[AssetFeatures]] shape:
  *   - `width`    = sample rate (Hz)
  *   - `height`   = channel count
  *   - `n_frames` = frames (samples per channel)
  *   - `feature`  = 8-bin histogram of all 16-bit samples (bin =
  *                  (s + 32768) >> 13); counts are integral and < 2^24, so
  *                  their Float representation is EXACT — oracle-comparable.
  */
object WavDecoder extends AssetDecoder {

  /** Parsed container layout: everything after the chunk walk. */
  private[multimodal] final case class WavLayout(
      channels: Int, sampleRate: Int, dataOff: Int, dataLen: Int)

  private def parseLayout(a: Asset): WavLayout = {
    val bytes = a.content
    def fail(why: String): Nothing = throw new IllegalArgumentException(
      s"asset ${a.asset_id}: not a PCM-16 WAV ($why)")
    if (bytes.length < 44) fail(s"only ${bytes.length} bytes")
    def tag(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (tag(0) != "RIFF") fail("missing RIFF magic")
    if (tag(8) != "WAVE") fail("missing WAVE form type")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

    // chunk walk: fmt must precede data per spec, but accept any order
    var pos = 12
    var channels = -1
    var sampleRate = -1
    var bits = -1
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= bytes.length && (dataOff < 0 || channels < 0)) {
      val id = tag(pos)
      val size = bb.getInt(pos + 4)
      // compare in Long: a crafted size near Int.MaxValue overflows the Int
      // sum and would bypass the guard (surfacing as an index error later)
      if (size < 0 || pos + 8 + size.toLong > bytes.length)
        fail(s"chunk $id overruns the payload")
      id match {
        case "fmt " =>
          if (size < 16) fail("fmt chunk too short")
          val audioFormat = bb.getShort(pos + 8) & 0xffff
          if (audioFormat != 1) fail(s"compression format $audioFormat")
          channels = bb.getShort(pos + 10) & 0xffff
          sampleRate = bb.getInt(pos + 12)
          bits = bb.getShort(pos + 22) & 0xffff
          if (bits != 16) fail(s"$bits-bit samples (PCM-16 only)")
          if (channels < 1) fail("zero channels")
        case "data" =>
          dataOff = pos + 8
          dataLen = size
        case _ => () // LIST/INFO/etc: skipped
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (channels < 0) fail("no fmt chunk")
    if (dataOff < 0) fail("no data chunk")
    WavLayout(channels, sampleRate, dataOff, dataLen)
  }

  override def decode(a: Asset): AssetFeatures = {
    val l = parseLayout(a)
    val bb = ByteBuffer.wrap(a.content).order(ByteOrder.LITTLE_ENDIAN)
    val nSamples = l.dataLen / 2
    val hist = new Array[Float](8)
    var i = 0
    while (i < nSamples) {
      val s = bb.getShort(l.dataOff + 2 * i).toInt // signed 16-bit
      hist((s + 32768) >> 13) += 1f
      i += 1
    }
    AssetFeatures(a.asset_id, "audio",
      width = l.sampleRate, height = l.channels,
      n_frames = nSamples / l.channels, feature = hist)
  }

  /** Full sample extraction through the same chunk walk — raw signed
    * 16-bit values, for downstream COLUMNAR feature math (frame energies
    * etc.): the decoder's imperative scope stays exactly byte-parsing,
    * everything after it is Catalyst-visible array arithmetic. */
  def decodePcm(a: Asset): AssetPcm = {
    val l = parseLayout(a)
    val bb = ByteBuffer.wrap(a.content).order(ByteOrder.LITTLE_ENDIAN)
    val nSamples = l.dataLen / 2
    val samples = new Array[Int](nSamples)
    var i = 0
    while (i < nSamples) {
      samples(i) = bb.getShort(l.dataOff + 2 * i).toInt
      i += 1
    }
    AssetPcm(a.asset_id, l.sampleRate, l.channels, nSamples, samples)
  }
}

/** One decoded PCM payload: raw signed 16-bit samples as ints. */
final case class AssetPcm(
    asset_id: Long, sample_rate: Int, channels: Int, n_samples: Int,
    samples: Array[Int])

/** Deterministic WAV fixture synthesis — real container bytes from a closed
  * form an SQL oracle can replay: for seed k, `64 + k % 64` mono PCM-16
  * samples `s_i = ((k*31 + i*7) mod 65536) - 32768` at rate
  * `8000 + (k % 3) * 4000` Hz. Generation is a typed-Dataset map: this is a
  * FIXTURE builder (the engine never synthesizes production data), and byte
  * assembly is inherently imperative. */
object WavFixtures {

  def wavBytes(seed: Long): Array[Byte] = {
    val n = (64 + seed % 64).toInt
    val rate = (8000 + (seed % 3) * 4000).toInt
    val samples = Array.tabulate(n) { i =>
      ((seed * 31 + i * 7) % 65536 - 32768).toShort
    }
    pcm16Wav(rate, channels = 1, samples)
  }

  /** Assemble a minimal RIFF/WAVE container around interleaved PCM-16
    * samples (the layout [[WavDecoder]] parses back). */
  def pcm16Wav(rate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(channels.toShort)
    bb.putInt(rate)
    bb.putInt(rate * channels * 2) // byte rate
    bb.putShort((channels * 2).toShort) // block align
    bb.putShort(16) // bits per sample
    bb.put("data".getBytes); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** (asset_id, modality, content, n_bytes, source) synthetic WAV corpus
    * keyed by the documents table's ids — the [[Asset]] schema. */
  def syntheticWavs(spark: SparkSession, docIds: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docIds.select("doc_id").as[Long].map { id =>
      val b = wavBytes(id)
      Asset(id, "audio", b, b.length.toLong, "synthetic-wav")
    }
  }
}
