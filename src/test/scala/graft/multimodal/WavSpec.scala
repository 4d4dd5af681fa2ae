package graft.multimodal

import graft.SparkSpec

class WavSpec extends SparkSpec {

  private def asset(bytes: Array[Byte], id: Long = 7L): Asset =
    Asset(id, "audio", bytes, bytes.length.toLong, "test")

  test("decodes a hand-built mono PCM-16 WAV exactly") {
    // samples chosen to land in known histogram bins:
    // -32768 -> bin 0, -1 -> bin 3, 0 -> bin 4, 32767 -> bin 7
    val bytes = WavFixtures.pcm16Wav(rate = 16000, channels = 1,
      samples = Array[Short](-32768, -1, 0, 32767, 0))
    val f = WavDecoder.decode(asset(bytes))
    assert(f.width == 16000 && f.height == 1 && f.n_frames == 5)
    assert(f.feature.toSeq == Seq(1f, 0f, 0f, 1f, 2f, 0f, 0f, 1f))
  }

  test("stereo: frames = samples per channel, histogram covers both channels") {
    val bytes = WavFixtures.pcm16Wav(rate = 8000, channels = 2,
      samples = Array[Short](0, 32767, -32768, -1)) // 2 frames interleaved
    val f = WavDecoder.decode(asset(bytes))
    assert(f.height == 2 && f.n_frames == 2)
    assert(f.feature.toSeq == Seq(1f, 0f, 0f, 1f, 1f, 0f, 0f, 1f))
  }

  test("skips foreign chunks (LIST) between fmt and data") {
    val plain = WavFixtures.pcm16Wav(16000, 1, Array[Short](0, 0))
    // splice a 6-byte LIST chunk (odd size exercises word-alignment padding)
    val bb = java.nio.ByteBuffer
      .allocate(plain.length + 8 + 6).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(plain, 0, 36) // RIFF..fmt chunk end
    bb.put("LIST".getBytes); bb.putInt(5); bb.put(Array[Byte](1, 2, 3, 4, 5, 0))
    bb.put(plain, 36, plain.length - 36) // data chunk
    val f = WavDecoder.decode(asset(bb.array()))
    assert(f.n_frames == 2 && f.feature(4) == 2f)
  }

  test("malformed inputs fail loudly with the asset id") {
    val good = WavFixtures.pcm16Wav(8000, 1, Array[Short](0))
    def expectFail(b: Array[Byte], why: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        WavDecoder.decode(asset(b, id = 42L))
      }
      assert(e.getMessage.contains("asset 42"), s"$why: ${e.getMessage}")
    }
    expectFail(Array[Byte](1, 2, 3), "truncated")
    expectFail("JUNK".getBytes ++ good.drop(4), "bad magic")
    val notPcm = good.clone
    notPcm(20) = 3 // audioFormat = IEEE float
    expectFail(notPcm, "non-PCM")
    val overrun = good.clone
    val bb = java.nio.ByteBuffer.wrap(overrun)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, 9999) // data chunk claims more bytes than exist
    expectFail(overrun, "overrun")
  }

  test("the synthetic fixture round-trips through the decoder") {
    val f = WavDecoder.decode(asset(WavFixtures.wavBytes(13L), id = 13L))
    assert(f.width == 12000 && f.height == 1) // 8000 + (13 % 3) * 4000
    assert(f.n_frames == 64 + 13 % 64)
    assert(f.feature.sum == f.n_frames.toFloat)
    // spot-check a sample against the closed form: s_0 = (13*31) - 32768
    val s0 = (13L * 31 % 65536 - 32768).toInt
    assert(f.feature((s0 + 32768) >> 13) >= 1f)
  }

  test("decodeFeatures runs the WAV decoder distributed over a Dataset") {
    val ids = spark.range(1, 21).toDF("doc_id")
    val out = Multimodal.decodeFeatures(spark,
      WavFixtures.syntheticWavs(spark, ids).toDF(), WavDecoder)
    val rows = out.collect()
    assert(rows.length == 20)
    assert(rows.forall(r => r.modality == "audio"
      && r.n_frames == 64 + r.asset_id % 64
      && r.feature.sum == r.n_frames.toFloat))
  }

  test("decodePcm extracts the exact sample values through the same walk") {
    val samples = Array[Short](-32768, -1, 0, 12345, 32767)
    val bytes = WavFixtures.pcm16Wav(rate = 16000, channels = 1, samples)
    val p = WavDecoder.decodePcm(asset(bytes))
    assert(p.sample_rate == 16000 && p.channels == 1 && p.n_samples == 5)
    assert(p.samples.toSeq == samples.map(_.toInt).toSeq)
    // histogram recomputed from the raw samples == decode()'s feature
    val hist = new Array[Float](8)
    p.samples.foreach(s => hist((s + 32768) >> 13) += 1f)
    assert(hist.toSeq == WavDecoder.decode(asset(bytes)).feature.toSeq)
    intercept[IllegalArgumentException] {
      WavDecoder.decodePcm(asset("not a wav at all".getBytes))
    }
  }

  test("frameEnergies: truncated last frame, exact sums, empty guard") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1, -2, 3, 4, 5)), // frames of 2: [1,-2] [3,4] [5]
      (2L, Seq.empty[Int])
    ).toDF("id", "samples")
    val out = df.select(col("id"),
      Multimodal.frameEnergies(col("samples"), frame = 2).as("e"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L) == Seq(5L, 25L, 25L))
    assert(out(2L) == Seq.empty)
    // full-scale PCM-16 values must not overflow the accumulator
    val big = Seq((3L, Seq.fill(32)(-32768))).toDF("id", "samples")
      .select(Multimodal.frameEnergies(col("samples"), 32).as("e"))
      .as[Seq[Long]].head()
    assert(big == Seq(32L * 32768L * 32768L))
  }
}
