package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** A second REAL decoder behind the [[AssetDecoder]] boundary: uncompressed
  * 24-bit BMP (BITMAPFILEHEADER + BITMAPINFOHEADER over raw bottom-up,
  * 4-byte-row-padded BGR pixels). Like WAV, BMP needs no codec library —
  * proving the [[Multimodal.decodeFeatures]] seam generalizes across
  * modalities: the image path gets genuine byte-level parsing (magic
  * validation, header fields, row-stride/padding walk) instead of the
  * FakeDecoder stand-in.
  *
  * Feature mapping into the fixed [[AssetFeatures]] shape:
  *   - `width` / `height` = pixel dimensions from the info header
  *   - `n_frames`         = 1 (still image)
  *   - `feature`          = 8-bin histogram of ALL pixel channel bytes
  *                          (bin = value >> 5); counts are integral and
  *                          < 2^24, so their Float representation is
  *                          EXACT — oracle-comparable.
  */
object BmpDecoder extends AssetDecoder {

  override def decode(a: Asset): AssetFeatures = {
    val bytes = a.content
    def fail(why: String): Nothing = throw new IllegalArgumentException(
      s"asset ${a.asset_id}: not an uncompressed 24-bit BMP ($why)")
    if (bytes.length < 54) fail(s"only ${bytes.length} bytes")
    if (bytes(0) != 'B' || bytes(1) != 'M') fail("missing BM magic")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOff = bb.getInt(10)
    val headerSize = bb.getInt(14)
    if (headerSize < 40) fail(s"info header $headerSize bytes (<40)")
    val width = bb.getInt(18)
    val height = bb.getInt(22)
    if (width <= 0 || height <= 0) fail(s"dimensions ${width}x$height")
    val bpp = bb.getShort(28) & 0xffff
    if (bpp != 24) fail(s"$bpp bpp (24-bit only)")
    val compression = bb.getInt(30)
    if (compression != 0) fail(s"compression $compression")
    val stride = ((width * 3 + 3) / 4) * 4
    // compare in Long: crafted headers near Int.MaxValue must not overflow
    // past the bounds check
    if (dataOff < 54 ||
      dataOff.toLong + stride.toLong * height > bytes.length)
      fail("pixel array overruns the payload")

    val hist = new Array[Float](8)
    var y = 0
    while (y < height) {
      val row = dataOff + y * stride // bottom-up, irrelevant to a histogram
      var i = 0
      while (i < width * 3) {
        hist((bytes(row + i) & 0xff) >> 5) += 1f
        i += 1
      }
      y += 1
    }
    AssetFeatures(a.asset_id, "image",
      width = width, height = height, n_frames = 1, feature = hist)
  }
}

/** Deterministic BMP fixture synthesis — real container bytes from a closed
  * form an SQL oracle can replay: for seed k, a `(4 + k % 13)` ×
  * `(2 + k % 7)` 24-bit image whose channel byte at (x, y, c∈{B,G,R}) is
  * `(k*13 + x*7 + y*5 + c*3) mod 256`. Widths 4..16 exercise every row
  * padding (stride = ceil(3w/4)*4). Fixture builder only — byte assembly
  * is inherently imperative, mirroring [[WavFixtures]]. */
object BmpFixtures {

  def bmpBytes(seed: Long): Array[Byte] = {
    val w = (4 + seed % 13).toInt
    val h = (2 + seed % 7).toInt
    bgr24Bmp(w, h,
      (x, y, c) => ((seed * 13 + x * 7 + y * 5 + c * 3) % 256).toByte)
  }

  /** Assemble a minimal BMP container around per-(x,y,channel) byte values
    * (the layout [[BmpDecoder]] parses back; channel order B,G,R). */
  def bgr24Bmp(w: Int, h: Int, v: (Int, Int, Int) => Byte): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val dataLen = stride * h
    val bb = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte); bb.put('M'.toByte)
    bb.putInt(54 + dataLen) // file size
    bb.putInt(0) // reserved
    bb.putInt(54) // pixel data offset
    bb.putInt(40) // BITMAPINFOHEADER size
    bb.putInt(w); bb.putInt(h)
    bb.putShort(1) // planes
    bb.putShort(24) // bpp
    bb.putInt(0) // BI_RGB
    bb.putInt(dataLen)
    bb.putInt(2835); bb.putInt(2835) // 72 DPI
    bb.putInt(0); bb.putInt(0) // palette
    var row = h - 1 // rows stored bottom-up
    while (row >= 0) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) { bb.put(v(x, row, c)); c += 1 }
        x += 1
      }
      var pad = stride - w * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      row -= 1
    }
    bb.array()
  }

  /** (asset_id, modality, content, n_bytes, source) synthetic BMP corpus
    * keyed by the documents table's ids — the [[Asset]] schema. */
  def syntheticBmps(spark: SparkSession, docIds: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docIds.select("doc_id").as[Long].map { id =>
      val b = bmpBytes(id)
      Asset(id, "image", b, b.length.toLong, "synthetic-bmp")
    }
  }
}
