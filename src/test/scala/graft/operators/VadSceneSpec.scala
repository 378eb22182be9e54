package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class VadSceneSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def wavMedia(ref: String, samples: Array[Int]) =
    Seq((ref, Multimodal.encodePcmWav(8000, 1, 8, samples)))
      .toDF("media_ref", "bytes")

  test("VAD: two active runs with known geometry") {
    // 10 frames of 40 samples: frames 1-2 and 5-7 loud, rest silent
    val loudFrames = Set(1, 2, 5, 6, 7)
    val s = (0 until 400).map { i =>
      if (loudFrames(i / 40)) (if (i % 2 == 0) 100 else -100) else 0
    }.toArray
    val r = Multimodal.audioVad(wavMedia("a", s), frameLen = 40,
      meanSqThreshold = 500L).head()
    assert(r.getAs[Long]("n_frames") == 10L)
    assert(r.getAs[Long]("n_active") == 5L)
    assert(r.getAs[Long]("n_segments") == 2L)
    assert(r.getAs[Long]("longest") == 3L)
    assert(r.getAs[Long]("first_active") == 1L)
  }

  test("VAD: all-silent payload reports zero segments, first_active -1") {
    val r = Multimodal.audioVad(wavMedia("s", Array.fill(120)(0)),
      frameLen = 40, meanSqThreshold = 500L).head()
    assert(r.getAs[Long]("n_frames") == 3L)
    assert(r.getAs[Long]("n_active") == 0L)
    assert(r.getAs[Long]("n_segments") == 0L)
    assert(r.getAs[Long]("longest") == 0L)
    assert(r.getAs[Long]("first_active") == -1L)
  }

  test("VAD: tail frame shorter than frameLen still framed (ceil)") {
    val r = Multimodal.audioVad(wavMedia("t", Array.fill(100)(90)),
      frameLen = 40, meanSqThreshold = 500L).head()
    // 100 samples -> frames of 40, 40, 20; 90^2=8100 > 500 everywhere
    assert(r.getAs[Long]("n_frames") == 3L)
    assert(r.getAs[Long]("n_active") == 3L)
    assert(r.getAs[Long]("n_segments") == 1L)
    assert(r.getAs[Long]("longest") == 3L)
  }

  test("scene cuts land exactly at luma jumps above the threshold") {
    // 9 constant-luma frames: scenes of 3 at luma 40, 180, 50
    val lums = Array(40, 40, 40, 180, 180, 180, 50, 50, 50)
    val bytes = Multimodal.encodeY4m(8, 6, 25, 1, lums.length,
      (f, _, _) => lums(f))
    val media = Seq(("v", bytes)).toDF("media_ref", "bytes")
    val r = Multimodal.sceneCuts(media, everyN = 1, threshold = 20L).head()
    assert(r.getAs[Long]("n_sampled") == 9L)
    assert(r.getAs[Long]("n_cuts") == 2L)
    assert(r.getSeq[Long](r.fieldIndex("cut_idx")) == Seq(3L, 6L))
    assert(r.getAs[Long]("max_jump") == 140L)
  }

  test("scene cuts: constant video has no cuts and max_jump 0") {
    val bytes = Multimodal.encodeY4m(8, 6, 25, 1, 4, (_, _, _) => 99)
    val media = Seq(("c", bytes)).toDF("media_ref", "bytes")
    val r = Multimodal.sceneCuts(media, everyN = 1, threshold = 20L).head()
    assert(r.getAs[Long]("n_cuts") == 0L)
    assert(r.getSeq[Long](r.fieldIndex("cut_idx")).isEmpty)
    assert(r.getAs[Long]("max_jump") == 0L)
  }
}
