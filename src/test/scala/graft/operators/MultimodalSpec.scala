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

  test("WAV: encode/decode roundtrip, 8-bit mono and 16-bit stereo") {
    // 8-bit mono square wave: +100/-100 alternating every 4 samples
    val sq = (0 until 64).map(i => if ((i / 4) % 2 == 0) 100 else -100).toArray
    val w8 = Multimodal.decodeWav(
      Multimodal.encodePcmWav(8000, 1, 8, sq)).get
    assert(w8.sample_rate == 8000 && w8.channels == 1 && w8.bits == 8)
    assert(w8.n_frames == 64 && w8.duration_ms == 8)
    assert(w8.sum_sq == 64L * 100 * 100)
    assert(w8.zero_crossings == 15) // 16 blocks -> 15 sign changes
    // 16-bit stereo: ch0 carries the signal, ch1 constant
    val st = (0 until 32).flatMap(i =>
      Seq(if (i % 2 == 0) 1000 else -1000, 7)).toArray
    val w16 = Multimodal.decodeWav(
      Multimodal.encodePcmWav(44100, 2, 16, st)).get
    assert(w16.channels == 2 && w16.bits == 16 && w16.n_frames == 32)
    assert(w16.sum_sq == 32L * 1000 * 1000 + 32L * 49)
    assert(w16.zero_crossings == 31)
    // zeros neither count nor reset the previous sign
    val z = Array(50, 0, 0, -50, 0, 50)
    val wz = Multimodal.decodeWav(
      Multimodal.encodePcmWav(8000, 1, 8, z)).get
    assert(wz.zero_crossings == 2)
  }

  test("y4m: encode/decode roundtrip with frame sampling") {
    val enc = Multimodal.encodeY4m(8, 6, 25, 1, nFrames = 5,
      (f, x, y) => (x + y * 8 + f * 100) % 256)
    val v = Multimodal.decodeY4m(enc, everyN = 2).get
    assert(v.width == 8 && v.height == 6)
    assert(v.fps_num == 25 && v.fps_den == 1)
    assert(v.n_frames == 5 && v.duration_ms == 200)
    assert(v.frame_ms == Seq(0L, 80L, 160L)) // frames 0, 2, 4 at 25 fps
    def lumaSum(f: Int) =
      (for (y <- 0 until 6; x <- 0 until 8)
        yield (x + y * 8 + f * 100) % 256).map(_.toLong).sum
    assert(v.luma_sum == Seq(lumaSum(0), lumaSum(2), lumaSum(4)))
    // everyN = 1 samples every frame
    assert(Multimodal.decodeY4m(enc).get.luma_sum.size == 5)
  }

  test("y4m: malformed payloads decode to None, never throw") {
    assert(Multimodal.decodeY4m(null).isEmpty)
    assert(Multimodal.decodeY4m("MPEG".getBytes).isEmpty)
    assert(Multimodal.decodeY4m(
      "YUV4MPEG2 W8 H6 F25:1\nNOTFRAME".getBytes).isEmpty)
    val good = Multimodal.encodeY4m(4, 4, 25, 1, 2, (_, _, _) => 10)
    assert(Multimodal.decodeY4m(good.dropRight(3)).isEmpty) // truncated frame
    // unsupported colour space tag
    val c411 = new String(good, "ISO-8859-1")
      .replace("C420", "C411").getBytes("ISO-8859-1")
    assert(Multimodal.decodeY4m(c411).isEmpty)
    // overflowing header dims: 65536*65536 wraps Int to 0, which before
    // the Long-math guard made frameBytes 0 and the frame walk loop
    // forever (a hang NonFatal cannot catch)
    assert(Multimodal.decodeY4m(
      "YUV4MPEG2 W65536 H65536 F25:1\nFRAME\n".getBytes).isEmpty)
    assert(Multimodal.decodeY4m(
      "YUV4MPEG2 W46341 H46341 F25:1\nFRAME\n".getBytes).isEmpty)
  }

  test("y4m: odd dimensions round-trip (encode chroma == decode sizing)") {
    val enc = Multimodal.encodeY4m(5, 3, 25, 1, nFrames = 3,
      (f, x, y) => f + x + y)
    val v = Multimodal.decodeY4m(enc).get
    assert(v.width == 5 && v.height == 3 && v.n_frames == 3)
    assert(v.luma_sum.size == 3)
  }

  test("IMA-ADPCM: features match an independently written decoder") {
    // straight-from-spec mini decoder, tables inlined — independent of
    // the production imaAdvance so a shared bug cannot self-confirm
    val steps = Multimodal.ImaSteps
    val idxTab = Array(-1, -1, -1, -1, 2, 4, 6, 8)
    def le16of(b: Array[Byte], i: Int) =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def refDecode(bytes: Array[Byte]): (Long, Long, Long) = {
      def le16(i: Int) = le16of(bytes, i)
      // encoder's fixed layout: RIFF(12) fmt(8+20) fact(8+4) data(8+..)
      val spb = le16(38)
      val dataLen = le16(56)
      val dataOff = 60
      var pred = le16(dataOff).toShort.toInt
      var idx = bytes(dataOff + 2) & 0xff
      var sumSq = pred.toLong * pred; var zc = 0L
      var prevSign = Integer.signum(pred)
      var produced = 1
      var p = dataOff + 4
      while (p < dataOff + dataLen && produced < spb) {
        val b = bytes(p) & 0xff
        Seq(b & 0xf, b >>> 4).foreach { nib =>
          if (produced < spb) {
            val step = steps(idx)
            var d = step >> 3
            if ((nib & 4) != 0) d += step
            if ((nib & 2) != 0) d += step >> 1
            if ((nib & 1) != 0) d += step >> 2
            pred = math.max(-32768,
              math.min(32767, if ((nib & 8) != 0) pred - d else pred + d))
            idx = math.max(0, math.min(88, idx + idxTab(nib & 7)))
            sumSq += pred.toLong * pred
            val s = Integer.signum(pred)
            if (s != 0 && prevSign != 0 && s != prevSign) zc += 1
            if (s != 0) prevSign = s
            produced += 1
          }
        }
        p += 1
      }
      (produced.toLong, sumSq, zc)
    }
    Seq(5L, 17L, 123L).foreach { seed =>
      val n = (seed % 150 + 100).toInt
      val samples = (0 until n)
        .map(i => ((((i * 37 + seed) % 256) - 128) * 256).toInt).toArray
      val wav = Multimodal.encodeImaAdpcmWav(8000, samples)
      val got = Multimodal.decodeWav(wav).get
      val (rn, rsq, rzc) = refDecode(wav)
      assert(got.bits == 4 && got.sample_rate == 8000)
      assert(got.n_frames == rn && rn == n)
      assert(got.sum_sq == rsq, s"seed $seed sum_sq")
      assert(got.zero_crossings == rzc, s"seed $seed zc")
      // sample 0 round-trips exactly through the block header
      assert(le16of(wav, 60).toShort.toInt == samples(0))
    }
  }

  test("WAV: malformed payloads decode to None, never throw") {
    assert(Multimodal.decodeWav(null).isEmpty)
    assert(Multimodal.decodeWav(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeWav("RIFFxxxxWAVE".getBytes ++
      new Array[Byte](40)).isEmpty) // no fmt/data chunks
    // valid container, non-PCM format code -> None
    val good = Multimodal.encodePcmWav(8000, 1, 8, Array(1, 2, 3))
    val nonPcm = good.clone(); nonPcm(20) = 3 // IEEE float format code
    assert(Multimodal.decodeWav(nonPcm).isEmpty)
    // truncated data chunk (declared size past the payload) -> None
    val trunc = good.dropRight(2)
    assert(Multimodal.decodeWav(trunc).isEmpty)
  }

  test("MJPEG AVI: constant-gray frames round-trip bit-exactly") {
    // quality-1.0 grayscale JPEG of a CONSTANT image is DC-only under
    // all-ones quant tables -> decode returns the exact value; this is
    // the property the q_video_mjpeg oracle leans on, so pin it here
    // for every 8-bit gray value, including non-multiple-of-8 dims
    val grays = 0 until 256
    val avi = Multimodal.encodeMjpegAvi(11, 7, usPerFrame = 40000,
      nFrames = 256, (f, _, _) => grays(f))
    val got = Multimodal.decodeAviMjpeg(avi, everyN = 1).get
    assert(got.width == 11 && got.height == 7)
    assert(got.us_per_frame == 40000L && got.n_frames == 256L)
    assert(got.duration_ms == 256L * 40)
    assert(got.luma_sum == grays.map(g => 11L * 7 * g))
    assert(got.frame_ms == (0 until 256).map(_ * 40L))
  }

  test("MJPEG AVI: frame sampling and non-constant frames") {
    val avi = Multimodal.encodeMjpegAvi(16, 8, usPerFrame = 100000,
      nFrames = 5, (f, x, y) => (x * 3 + y * 5 + f * 7) % 256)
    val all = Multimodal.decodeAviMjpeg(avi, everyN = 1).get
    assert(all.n_frames == 5 && all.luma_sum.length == 5)
    val every2 = Multimodal.decodeAviMjpeg(avi, everyN = 2).get
    assert(every2.n_frames == 5) // sampling changes features, not count
    assert(every2.frame_ms == Seq(0L, 200L, 400L))
    assert(every2.luma_sum == Seq(all.luma_sum(0), all.luma_sum(2),
                                  all.luma_sum(4)))
    // gradient frames decode lossily but deterministically: the two
    // reads above must agree on the shared frames (they did), and sums
    // stay within the 8-bit pixel range bound
    assert(all.luma_sum.forall(s => s >= 0 && s <= 16L * 8 * 255))
  }

  test("MJPEG AVI: skips non-video chunks and rec-nested frames decode") {
    // hand-compose a movi list interleaving audio ('01wb') chunks and
    // one 'rec '-nested video frame around the canonical encoder pieces
    val jpeg = (g: Int) => Multimodal.encodeGrayJpeg(9, 6, (_, _) => g)
    val canonical = Multimodal.encodeMjpegAvi(9, 6, 40000, 1, (_, _, _) => 50)
    // reuse the canonical header (everything up to the movi LIST)
    val moviAt = {
      var i = 12; var at = -1
      while (at < 0) {
        val id = new String(canonical, i, 4, "US-ASCII")
        val sz = (canonical(i + 4) & 0xff) | ((canonical(i + 5) & 0xff) << 8) |
          ((canonical(i + 6) & 0xff) << 16) | ((canonical(i + 7) & 0xff) << 24)
        if (id == "LIST" &&
            new String(canonical, i + 8, 4, "US-ASCII") == "movi") at = i
        else i += 8 + sz + (sz & 1)
      }
      at
    }
    val header = canonical.slice(12, moviAt)
    val movi = Multimodal.aviList("movi",
      Multimodal.aviChunk("01wb", Array[Byte](1, 2, 3)) ++ // audio: skip
      Multimodal.aviChunk("00dc", jpeg(10)) ++
      Multimodal.aviChunk("01wb", Array[Byte](4, 5)) ++
      Multimodal.aviList("rec ", Multimodal.aviChunk("00dc", jpeg(20))) ++
      Multimodal.aviChunk("00dc", jpeg(30)))
    val avi = Multimodal.aviRiff(header ++ movi)
    val got = Multimodal.decodeAviMjpeg(avi, everyN = 1).get
    assert(got.n_frames == 3)
    assert(got.luma_sum == Seq(10L, 20L, 30L).map(_ * 9 * 6))
  }

  test("MJPEG AVI: malformed payloads decode to None, never throw") {
    assert(Multimodal.decodeAviMjpeg(null).isEmpty)
    assert(Multimodal.decodeAviMjpeg(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeAviMjpeg(
      "RIFFxxxxWAVE".getBytes ++ new Array[Byte](40)).isEmpty) // not AVI
    val good = Multimodal.encodeMjpegAvi(9, 6, 40000, 2, (_, _, _) => 99)
    // truncated mid-frame -> None (chunk size past payload)
    assert(Multimodal.decodeAviMjpeg(good.dropRight(10)).isEmpty)
    // corrupt a frame's JPEG magic -> undecodable frame fails the payload
    val corrupt = good.clone()
    val soi = {
      var i = 0; var at = -1
      while (at < 0 && i < corrupt.length - 1) {
        if ((corrupt(i) & 0xff) == 0xff && (corrupt(i + 1) & 0xff) == 0xd8)
          at = i
        i += 1
      }
      at
    }
    assert(soi > 0)
    corrupt(soi) = 0
    assert(Multimodal.decodeAviMjpeg(corrupt).isEmpty)
    // audio-only stream table (fccType 'auds') -> unsupported, None
    val audioOnly = {
      val s = new String(good, "ISO-8859-1")
      val i = s.indexOf("vids")
      val b = good.clone()
      "auds".getBytes("US-ASCII").copyToArray(b, i)
      b
    }
    assert(Multimodal.decodeAviMjpeg(audioOnly).isEmpty)
    // zero-frame movi -> None
    val noFrames = Multimodal.encodeMjpegAvi(9, 6, 40000, 0, (_, _, _) => 0)
    assert(Multimodal.decodeAviMjpeg(noFrames).isEmpty)
  }

  test("GIF: lossless round-trip for every palette value + timing") {
    // LZW is lossless, so a constant-index frame decodes to exactly the
    // palette gray — the q_video_gif oracle's whole premise; cover all
    // 256 values (also crosses several CLEAR-reset boundaries at 13x9)
    val gif = Multimodal.encodeGif(13, 9, delayCs = 7, nFrames = 256,
      f => f)
    val got = Multimodal.decodeGif(gif, everyN = 1).get
    assert(got.width == 13 && got.height == 9)
    assert(got.n_frames == 256L)
    assert(got.duration_ms == 256L * 70)
    assert(got.luma_sum == (0 until 256).map(g => 13L * 9 * g))
    assert(got.frame_ms == (0 until 256).map(_ * 70L))
  }

  test("GIF: frame sampling selects composited states, keeps timing") {
    val gif = Multimodal.encodeGif(10, 6, delayCs = 4, nFrames = 5,
      f => f * 50)
    val every2 = Multimodal.decodeGif(gif, everyN = 2).get
    assert(every2.n_frames == 5L)
    assert(every2.duration_ms == 5L * 40)
    assert(every2.frame_ms == Seq(0L, 80L, 160L))
    assert(every2.luma_sum == Seq(0L, 10L * 6 * 100, 10L * 6 * 200))
  }

  test("GIF: partial frames composite onto the canvas with disposal") {
    import Multimodal.GifFrame
    // screen 8x4; frame0 full screen gray 10; frame1 a 2x2 patch of
    // gray 200 at (3,1) kept (doNotDispose); frame2 a 1x1 patch of
    // gray 90 at (0,0) with restoreToBackground
    val gif = Multimodal.encodeGifFrames(8, 4, Seq(
      GifFrame(0, 0, 8, 4, 10, 5, disposal = 1),
      GifFrame(3, 1, 2, 2, 200, 5, disposal = 1),
      GifFrame(0, 0, 1, 1, 90, 5, disposal = 2)))
    val got = Multimodal.decodeGif(gif, everyN = 1).get
    assert(got.width == 8 && got.height == 4) // logical screen, not rect
    val full = 8L * 4 * 10
    assert(got.luma_sum == Seq(
      full,                          // frame 0 displayed
      full - 4 * 10 + 4 * 200,       // patch replaces 4 pixels
      full - 4 * 10 + 4 * 200 - 10 + 90)) // 1px patch over frame1 state
    // frame2's restoreToBackground applies AFTER its display — the
    // sums above are the displayed states, which is what features mean
  }

  test("GIF: restoreToPrevious reverts the patched rect") {
    import Multimodal.GifFrame
    val gif = Multimodal.encodeGifFrames(6, 3, Seq(
      GifFrame(0, 0, 6, 3, 100, 2, disposal = 1),
      GifFrame(2, 1, 2, 1, 0, 2, disposal = 3), // transient black patch
      GifFrame(5, 2, 1, 1, 255, 2, disposal = 1)))
    val got = Multimodal.decodeGif(gif, everyN = 1).get
    val full = 6L * 3 * 100
    assert(got.luma_sum == Seq(
      full,
      full - 2 * 100,          // patch shown
      full - 100 + 255))       // patch REVERTED, then 1px white drawn
  }

  test("GIF: malformed payloads decode to None, never throw") {
    assert(Multimodal.decodeGif(null).isEmpty)
    assert(Multimodal.decodeGif(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeGif("NOTAGIF".getBytes("US-ASCII")).isEmpty)
    val good = Multimodal.encodeGif(8, 8, 4, 3, _ => 42)
    // header-only truncation (inside the palette) -> None
    assert(Multimodal.decodeGif(good.take(20)).isEmpty)
    // truncation mid-frame: the reader may surface fewer frames or
    // fail; either way no throw and no phantom full count with data cut
    val cut = Multimodal.decodeGif(good.dropRight(good.length / 2))
    assert(cut.forall(_.n_frames <= 3L))
  }

  test("G.711: ITU table landmark values expand exactly") {
    // published landmarks: mu-law 0x00 -> -32124, 0xff/0x7f -> 0,
    // 0x80 -> +32124; A-law 0x55 -> -8 (sign CLEAR is negative),
    // 0xd5 -> +8, 0x2a -> -32256, 0xaa -> +32256
    assert(Multimodal.ulawToLinear(0x00) == -32124)
    assert(Multimodal.ulawToLinear(0xff) == 0)
    assert(Multimodal.ulawToLinear(0x7f) == 0)
    assert(Multimodal.ulawToLinear(0x80) == 32124)
    assert(Multimodal.alawToLinear(0x55) == -8)
    assert(Multimodal.alawToLinear(0xd5) == 8)
    assert(Multimodal.alawToLinear(0x2a) == -32256)
    assert(Multimodal.alawToLinear(0xaa) == 32256)
    // sign symmetry across the whole byte range
    (0 until 128).foreach { i =>
      assert(Multimodal.ulawToLinear(i) == -Multimodal.ulawToLinear(i | 0x80))
      assert(Multimodal.alawToLinear(i) == -Multimodal.alawToLinear(i | 0x80))
    }
  }

  test("G.711: WAV container decode routes by format tag") {
    val data = (0 until 256).map(_.toByte).toArray
    val mu = Multimodal.decodeWav(
      Multimodal.encodeG711Wav(8000, mulaw = true, data)).get
    val al = Multimodal.decodeWav(
      Multimodal.encodeG711Wav(8000, mulaw = false, data)).get
    assert(mu.n_frames == 256 && al.n_frames == 256)
    assert(mu.duration_ms == 256 * 1000 / 8000)
    def sumSq(dec: Int => Int) =
      (0 until 256).map(b => dec(b).toLong * dec(b)).sum
    assert(mu.sum_sq == sumSq(Multimodal.ulawToLinear))
    assert(al.sum_sq == sumSq(Multimodal.alawToLinear))
    assert(mu.sum_sq != al.sum_sq) // the two codecs must not alias
  }

  test("aHash: scale-invariant blocks, perturbation locality, " +
      "undecodable dropped") {
    def px(x: Int, y: Int): Int = (x * 31 + y * 17) % 256
    val base = Multimodal.aHash(Multimodal.encodeGrayPng(16, 16, px)).get
    // nearest-neighbour 2x upscale preserves every cell mean exactly
    val up = Multimodal.aHash(
      Multimodal.encodeGrayPng(32, 32, (x, y) => px(x / 2, y / 2))).get
    assert((base._3, base._4) == ((up._3, up._4)),
      "aHash must be resolution-invariant under exact upscaling")
    // halves are non-negative 32-bit values
    assert(base._3 >= 0L && base._3 < (1L << 32) &&
      base._4 >= 0L && base._4 < (1L << 32))
    // one corner pixel shifted: Hamming stays tiny
    val pert = Multimodal.aHash(Multimodal.encodeGrayPng(16, 16,
      (x, y) => if (x == 15 && y == 15) (px(x, y) + 180) % 256
                else px(x, y))).get
    val dist = java.lang.Long.bitCount(base._3 ^ pert._3) +
      java.lang.Long.bitCount(base._4 ^ pert._4)
    assert(dist <= 3, s"one-pixel change moved $dist bits")
    // a wholly different image is far
    val other = Multimodal.aHash(Multimodal.encodeGrayPng(16, 16,
      (x, y) => (y * 16 + (15 - x)) % 256)).get
    val far = java.lang.Long.bitCount(base._3 ^ other._3) +
      java.lang.Long.bitCount(base._4 ^ other._4)
    assert(far > 3)
    assert(Multimodal.aHash("not an image".getBytes).isEmpty)
    assert(Multimodal.aHash(null).isEmpty)
  }

  test("imageNearDupPairs: planted twin found, blocking exact at " +
      "Hamming <= 3") {
    val s = graft.TestSpark.spark
    import s.implicits._
    def mk(f: (Int, Int) => Int) = Multimodal.encodeGrayPng(16, 16, f)
    val rows = Seq(
      ("img/a", mk((x, y) => (x * 31 + y * 17) % 256)),
      ("img/b", mk((x, y) => // a's corner twin
        if (x == 15 && y == 15) ((15 * 31 + 15 * 17) % 256 + 180) % 256
        else (x * 31 + y * 17) % 256)),
      ("img/c", mk((x, y) => (y * 16 + (15 - x)) % 256)),
      ("img/junk", Array[Byte](1, 2, 3)))
      .toDF("media_ref", "bytes")
    val pairs = Multimodal.imageNearDupPairs(rows, maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set(("img/a", "img/b")))
    assert(pairs.head._3 <= 3)
  }

  test("dctHash matches an independent single-pass replay") {
    def p(x: Int, y: Int): Int = (x * 31 + y * 17) % 256
    val Some((hi, lo)) = Multimodal.dctHash(Multimodal.encodeGrayPng(16, 16, p))
    // independent replay: one straight double loop per coefficient,
    // same quantized table (the two-pass production order must agree)
    val t = Multimodal.dctCosQ(16)
    val c = Array.tabulate(8, 8)((u, v) =>
      (for (y <- 0 until 16; x <- 0 until 16)
        yield p(x, y).toLong * t(u)(x) * t(v)(y)).sum)
    val med = (for (u <- 0 until 8; v <- 0 until 8 if u != 0 || v != 0)
      yield c(u)(v)).sorted.apply(31)
    var (ehi, elo) = (0L, 0L)
    for (cell <- 1 until 64 if c(cell / 8)(cell % 8) > med)
      if (cell < 32) elo |= 1L << cell else ehi |= 1L << (cell - 32)
    assert((hi, lo) == ((ehi, elo)))
  }

  test("dctHash is exactly invariant under pixel scaling") {
    def p(x: Int, y: Int): Int = (x * 13 + y * 7) % 128
    val a = Multimodal.dctHash(Multimodal.encodeGrayPng(16, 16, p))
    val b = Multimodal.dctHash(
      Multimodal.encodeGrayPng(16, 16, (x, y) => 2 * p(x, y) % 256))
    assert(a.isDefined && a == b,
      "doubling every pixel doubles every coefficient and the median")
  }

  test("dctHash decodes RGB like gray (luminance) and rejects junk") {
    def p(x: Int, y: Int): Int = (x * 31 + y * 17) % 256
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, p(x, y) * 0x010101)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(Multimodal.dctHash(bos.toByteArray) ==
      Multimodal.dctHash(Multimodal.encodeGrayPng(16, 16, p)))
    assert(Multimodal.dctHash("junk".getBytes).isEmpty)
  }

  test("captionPairs: nearest preceding text wins, following is the " +
       "fallback, empty text spans are skipped") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    // (kind, text, media_ref, offset) tuples per doc
    val docs = Seq(
      // doc 1: text then image then text -> 'before'; second image
      // after an EMPTY text span still pairs with the earlier text
      (1L, Seq(("text", "alpha", "", 0), ("image", "", "img:1", 10),
               ("text", "", "", 20), ("image", "", "img:1b", 30),
               ("text", "omega", "", 40))),
      // doc 2: image first -> 'after'
      (2L, Seq(("image", "", "img:2", 0), ("text", "beta", "", 10))),
      // doc 3: no text at all -> 'none', caption ''
      (3L, Seq(("image", "", "img:3", 0))),
      // doc 4: same offset tie -> array position breaks it
      (4L, Seq(("text", "first", "", 0), ("text", "second", "", 0),
               ("image", "", "img:4", 0)))
    ).toDF("doc_id", "raw")
      .selectExpr("doc_id",
        "transform(raw, r -> struct(r._1 as kind, r._2 as text, " +
          "r._3 as media_ref, r._4 as offset)) as spans")
    val got = Multimodal.captionPairs(docs)
      .select("media_ref", "caption", "cap_side")
      .as[(String, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("img:1") == ("alpha", "before"))
    assert(got("img:1b") == ("alpha", "before"),
      "empty text span must not shadow the real caption")
    assert(got("img:2") == ("beta", "after"))
    assert(got("img:3") == ("", "none"))
    assert(got("img:4") == ("second", "before"),
      "offset tie resolves by span array position")
  }
}
