package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  /** Independent JVM Morton reference. */
  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { b =>
      (((x >> b) & 1L) << (2 * b + 1)) | (((y >> b) & 1L) << (2 * b))
    }.reduce(_ | _)

  test("zorderCol matches the JVM reference, negatives masked two's-complement") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val pts = (0 until 500).map(_ =>
      (rnd.nextLong(1 << 12) - 2048, rnd.nextLong(1 << 12) - 2048))
    val got = pts.toDF("x", "y")
      .withColumn("z", Layout.zorderCol(col("x"), col("y"), 10))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(x & 1023, y & 1023, 10), s"($x,$y)")
    }
  }

  test("z-range buckets prune a box with no false negatives") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val pts = (0 until 4000).map(_ =>
      (rnd.nextLong(1024), rnd.nextLong(1024)))
    val df = pts.toDF("x", "y")
    val (x0, x1, y0, y1) = (100L, 250L, 600L, 700L)
    val stats = Layout.boxCandidates(
      Layout.zBucketStats(df, "x", "y", bits = 10, bucketBits = 6),
      x0, x1, y0, y1).collect()
    val candidates = stats.filter(_.getAs[Boolean]("candidate"))
    // pruning is real: the box covers ~1.4% of the area; candidate
    // buckets must be a strict minority of the 64
    assert(stats.length == 64)
    assert(candidates.length < 32, s"${candidates.length} candidates")
    // no false negatives: every in-box point's bucket is a candidate
    val candSet = candidates.map(_.getAs[Long]("bucket")).toSet
    pts.filter(p => p._1 >= x0 && p._1 <= x1 && p._2 >= y0 && p._2 <= y1)
      .foreach { case (x, y) =>
        val bucket = mortonRef(x, y, 10) >> 14
        assert(candSet.contains(bucket), s"point ($x,$y) bucket $bucket")
      }
  }
}
