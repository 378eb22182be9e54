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

  test("joinEstimate: exact cardinality and the strategy ladder") {
    val s = spark
    import s.implicits._
    // a: k1 x2, k2 x1, k3 x1; b: k1 x3, k2 x2, k9 x5 (k9 never joins)
    val a = Seq("k1", "k1", "k2", "k3").toDF("k")
    val b = (Seq.fill(3)("k1") ++ Seq.fill(2)("k2") ++ Seq.fill(5)("k9"))
      .toDF("k")
    // join rows = 2*3 + 1*2 = 8, hottest key k1 -> 6
    val r = Layout.joinEstimate(a, b, Seq("k"), parallelism = 4,
      broadcastRowLimit = 2L).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 10L)  // rows
    assert(r.getLong(2) == 3L && r.getLong(3) == 3L)   // keys
    assert(r.getLong(4) == 2L)                         // common keys
    assert(r.getLong(5) == 8L && r.getLong(6) == 6L)
    // max_key_out*par = 24 > join_rows*4 = 32? no -> plain shuffle
    assert(r.getString(7) == "shuffle")
    // tiny side under the limit -> broadcast wins
    val br = Layout.joinEstimate(a, b, Seq("k"), 4,
      broadcastRowLimit = 100L).head()
    assert(br.getString(7) == "broadcast")
    // one key dominating the output -> salted
    val hot = (Seq.fill(20)("k1") ++ Seq("k2")).toDF("k")
    val sr = Layout.joinEstimate(hot, hot, Seq("k"), 8, 2L).head()
    assert(sr.getString(7) == "salted_shuffle")
  }

  test("skewReport: exact shape stats and the salt rule on a known " +
      "distribution") {
    val s = spark
    import s.implicits._
    // counts: a=6, b=2, c=1, d=1 -> total 10, 4 keys
    val rows = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .toDF("k")
    val r = Layout.skewReport(rows, Seq("k"), parallelism = 8).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 10L &&
      r.getLong(2) == 6L)
    // ascending (cnt, key): c=1(i1), d=1(i2), b=2(i3), a=6(i4)
    // p50 at ceil(2)=2 -> 1; p90 at ceil(3.6)=4 -> 6; p99 at 4 -> 6
    assert(r.getLong(3) == 1L && r.getLong(4) == 6L && r.getLong(5) == 6L)
    // skew_ratio = 6*4/10 = 2.4
    assert(r.getDouble(6) == 2.4)
    // gini = 2*(1*1+1*2+2*3+6*4)/(4*10) - 5/4 = 2*33/40 - 1.25 = 0.4
    assert(math.abs(r.getDouble(7) - 0.4) < 1e-9)
    // salt = ceil(6*8/10) = 5
    assert(r.getLong(8) == 5L)
    // uniform distribution: gini 0, salt 1
    val uni = (0 until 8).flatMap(i => Seq.fill(3)(s"k$i")).toDF("k")
    val u = Layout.skewReport(uni, Seq("k"), parallelism = 8).head()
    assert(math.abs(u.getDouble(7)) < 1e-9 && u.getLong(8) == 1L &&
      u.getDouble(6) == 1.0)
  }
}
