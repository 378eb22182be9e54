package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  test("bucketed range join == brute force, negatives included, no dup pairs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val points = (0L until 300L).map(i => (i, rnd.nextLong(2000) - 1000))
    val ivals = (0L until 80L).map { i =>
      val lo = rnd.nextLong(2000) - 1000
      (i, lo, lo + rnd.nextLong(120))
    }
    val got = RangeJoin.rangeJoin(points.toDF("pid", "v"),
        ivals.toDF("iid", "lo", "hi"), "v", "lo", "hi", bucketWidth = 64)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = for {
      (p, v) <- points; (i, lo, hi) <- ivals if v >= lo && v <= hi
    } yield (p, i)
    assert(got.length == got.distinct.length, "pair emitted twice")
    assert(got.sorted.toSeq == want.sorted.toSeq)
  }

  test("empty and inverted intervals match nothing; width 1 works") {
    val s = spark
    import s.implicits._
    val out = RangeJoin.rangeJoin(
      Seq((1L, 5L), (2L, 7L)).toDF("pid", "v"),
      Seq((10L, 5L, 5L), (11L, 9L, 3L)).toDF("iid", "lo", "hi"),
      "v", "lo", "hi", bucketWidth = 1)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 10L))) // point-interval [5,5]; inverted drops
  }

  test("mega-interval fails loudly with advice") {
    val s = spark
    import s.implicits._
    val e = intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(
        Seq((1L, 5L)).toDF("pid", "v"),
        Seq((10L, 0L, 10000000L)).toDF("iid", "lo", "hi"),
        "v", "lo", "hi", bucketWidth = 16, maxBucketsPerInterval = 1000)
    }
    assert(e.getMessage.contains("raise bucketWidth"))
  }
}
