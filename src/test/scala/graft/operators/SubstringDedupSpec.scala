package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SubstringDedupSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val w8 = "w1 w2 w3 w4 w5 w6 w7 w8"

  test("windowFingerprints: one md5 per 8-token window, short docs none") {
    val docs = Seq(
      (1L, s"$w8 w9 w10"),        // 10 tokens -> 3 windows
      (2L, "too short to window") // 4 tokens -> 0 windows
    ).toDF("doc_id", "text")
    val fps = SubstringDedup.windowFingerprints(docs)
      .as[(Long, Int, String)].collect()
    assert(fps.count(_._1 == 1L) == 3)
    assert(fps.count(_._1 == 2L) == 0)
    // first window's fingerprint is md5 of the literal joined window
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest(w8.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(fps.filter(r => r._1 == 1L && r._2 == 0).head._3 == want)
  }

  test("sharedPairs finds overlap; survivors drop the larger doc_id") {
    val docs = Seq(
      (10L, s"prefix a $w8 suffix b"),
      (20L, s"$w8 completely different tail x y z"),
      (30L, "nothing in common with anyone at all here now ok")
    ).toDF("doc_id", "text")
    val pairs = SubstringDedup.sharedPairs(docs)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((10L, 20L, 1L)))
    val kept = SubstringDedup.survivors(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(10L, 30L), "20 shares a window with smaller 10")
  }

  test("maxBucket drops mega-bucket fingerprints from the pair form") {
    // 5 docs all sharing one window: bucket width 5 > maxBucket 3 -> no
    // pairs from it; two docs share a second, rarer window -> 1 pair
    val common = w8
    val rare   = "r1 r2 r3 r4 r5 r6 r7 r8"
    val docs = (1L to 5L).map { i =>
      val tail = if (i <= 2) rare else s"tail$i t2$i t3$i t4$i t5$i t6$i t7$i t8$i"
      (i, s"$common $tail")
    }.toDF("doc_id", "text")
    val pairs = SubstringDedup.sharedPairs(docs, maxBucket = 3)
      .as[(Long, Long, Long)].collect().toSet
    // the common window is suppressed; only the rare window pairs 1-2.
    // overlap windows spanning common->tail are unique per doc except
    // for docs 1,2 whose overlap region is identical
    assert(pairs.forall { case (a, b, _) => (a, b) == (1L, 2L) })
    assert(pairs.nonEmpty)
  }

  test("survivors keep docs with no windows (short docs) untouched") {
    val docs = Seq((1L, s"$w8 more"), (2L, s"$w8 other"), (3L, "tiny doc"))
      .toDF("doc_id", "text")
    val kept = SubstringDedup.survivors(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }
}
