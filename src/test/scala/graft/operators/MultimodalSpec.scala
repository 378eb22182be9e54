package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Real-decode contract: javax.imageio PNG roundtrip is lossless, so
  * decode(encode(px)) must reproduce dimensions and the exact luminance
  * histogram; resize is hand-rolled nearest-neighbor, so every output
  * pixel must equal a predictable source pixel.
  */
class MultimodalSpec extends AnyFunSuite {

  private def px(x: Int, y: Int): Int = (x * 31 + y * 17) % 256

  test("decodeImage roundtrips an encoded gray PNG exactly") {
    val bytes = Multimodal.encodeGrayPng(13, 9, px)
    val Some((w, h, hist)) = Multimodal.decodeImage(bytes)
    assert(w == 13 && h == 9)
    val expected = new Array[Long](16)
    for (y <- 0 until 9; x <- 0 until 13) expected(px(x, y) >> 4) += 1
    assert(hist.toSeq == expected.toSeq)
    assert(hist.sum == 13L * 9)
  }

  test("decodeImage rejects non-image payloads") {
    assert(Multimodal.decodeImage("not a png".getBytes).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
  }

  test("resizeImage scales to maxDim with exact nearest-neighbor pixels") {
    val bytes = Multimodal.encodeGrayPng(64, 32, px)
    val out   = Multimodal.resizeImage(bytes, 16)
    val img   = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(img.getWidth == 16 && img.getHeight == 8)
    for (y <- 0 until 8; x <- 0 until 16) {
      val sx = x * 64 / 16
      val sy = y * 32 / 8
      val v  = img.getRaster.getSample(x, y, 0)
      assert(v == px(sx, sy), s"pixel ($x,$y) -> src ($sx,$sy)")
    }
  }

  test("resizeImage returns null for undecodable payloads") {
    assert(Multimodal.resizeImage("junk".getBytes, 16) == null)
  }

  test("imageFeatures: undecodable rows yield null features") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val good = Multimodal.encodeGrayPng(8, 8, px)
    val media = Seq(
      ("m1", good), ("m2", "garbage".getBytes)
    ).toDF("media_ref", "bytes")
    val out = Multimodal.imageFeatures(media)
      .select("media_ref", "dec_width", "dec_height")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(out("m1").contains(8))
    assert(out("m2").isEmpty)
  }
}
