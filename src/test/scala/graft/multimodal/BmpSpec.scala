package graft.multimodal

import graft.SparkSpec

class BmpSpec extends SparkSpec {

  private def asset(bytes: Array[Byte], id: Long = 7L): Asset =
    Asset(id, "image", bytes, bytes.length.toLong, "test")

  test("decodes a hand-built 24-bit BMP exactly") {
    // 2x2, all four pixels with known channel bytes: 0 -> bin 0,
    // 31 -> bin 0, 32 -> bin 1, 255 -> bin 7 (each appears 4x)
    val vals = Array[Byte](0, 31, 32.toByte, 255.toByte)
    val bytes = BmpFixtures.bgr24Bmp(2, 2, (x, y, c) =>
      if (c == 0) vals(y * 2 + x) else vals(y * 2 + x))
    val f = BmpDecoder.decode(asset(bytes))
    assert(f.width == 2 && f.height == 2 && f.n_frames == 1)
    assert(f.feature.sum == 12f) // 4 pixels x 3 channels
    assert(f.feature(0) == 6f) // 0 and 31, three channels each
    assert(f.feature(1) == 3f && f.feature(7) == 3f)
  }

  test("row padding bytes are excluded from the histogram") {
    // width 3 -> row = 9 bytes, stride 12: three zero pad bytes per row
    // would inflate bin 0 if counted
    val bytes = BmpFixtures.bgr24Bmp(3, 2, (_, _, _) => 255.toByte)
    val f = BmpDecoder.decode(asset(bytes))
    assert(f.feature(7) == 18f && f.feature(0) == 0f)
  }

  test("malformed inputs fail loudly with the asset id") {
    val good = BmpFixtures.bmpBytes(5L)
    def expectFail(b: Array[Byte], why: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        BmpDecoder.decode(asset(b, id = 42L))
      }
      assert(e.getMessage.contains("asset 42"), s"$why: ${e.getMessage}")
    }
    expectFail(Array[Byte](1, 2, 3), "truncated")
    expectFail("XX".getBytes ++ good.drop(2), "bad magic")
    val not24 = good.clone
    not24(28) = 8 // 8 bpp
    expectFail(not24, "palette bmp")
    val compressed = good.clone
    compressed(30) = 1 // BI_RLE8
    expectFail(compressed, "compressed")
    val overrun = good.clone
    java.nio.ByteBuffer.wrap(overrun)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(18, 10000) // width claims more pixels than exist
    expectFail(overrun, "overrun")
  }

  test("the synthetic fixture round-trips through the decoder") {
    val f = BmpDecoder.decode(asset(BmpFixtures.bmpBytes(13L), id = 13L))
    assert(f.width == 4 + 13 % 13 && f.height == 2 + 13 % 7)
    assert(f.feature.sum == (f.width * f.height * 3).toFloat)
    // spot-check one channel byte against the closed form: (x=0,y=0,c=0)
    val v0 = (13L * 13 % 256).toInt
    assert(f.feature(v0 >> 5) >= 1f)
  }

  test("decodeFeatures runs the BMP decoder distributed over a Dataset") {
    val ids = spark.range(1, 21).toDF("doc_id")
    val out = Multimodal.decodeFeatures(spark,
      BmpFixtures.syntheticBmps(spark, ids).toDF(), BmpDecoder)
    val rows = out.collect()
    assert(rows.length == 20)
    assert(rows.forall(r => r.modality == "image"
      && r.width == 4 + r.asset_id % 13
      && r.feature.sum == (r.width * r.height * 3).toFloat))
  }
}
