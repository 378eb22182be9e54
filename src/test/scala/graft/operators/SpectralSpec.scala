package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SpectralSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Vectors drawn along a known dominant axis: x = t*(3,4)/5 + noise
  // orthogonal to it. PC1 of the covariance must align with (0.6, 0.8)
  // and carry almost all the variance.
  private lazy val planted = {
    val ts = Seq(-10.0, -6.0, -2.0, 1.0, 4.0, 7.0, 11.0, -8.0, 3.0, 9.0)
    val ns = Seq(0.1, -0.2, 0.15, -0.05, 0.2, -0.1, 0.05, 0.1, -0.15, 0.0)
    ts.zip(ns).zipWithIndex.map { case ((t, n), i) =>
      // noise direction (-0.8, 0.6) is orthogonal to (0.6, 0.8)
      (i.toLong, Array((0.6 * t - 0.8 * n).toFloat, (0.8 * t + 0.6 * n).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("covariance is symmetric with positive diagonal") {
    val c = Spectral.covariance(planted).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(c((1, 2)) == c((2, 1)))
    assert(c((1, 1)) > 0 && c((2, 2)) > 0)
  }

  test("power iteration recovers the planted axis") {
    val rows = Spectral.pcaTop(planted, iters = 8).orderBy("idx").collect()
    val v = rows.map(_.getDouble(1))
    // sign fixed by the all-ones start: (0.6, 0.8) has positive sum
    assert(math.abs(v(0) - 0.6) < 0.01, s"v1=${v(0)}")
    assert(math.abs(v(1) - 0.8) < 0.01, s"v2=${v(1)}")
    // unit norm after the final normalize
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-6)
  }

  test("variance share near 1 for a rank-1-plus-noise cloud, constant across rows") {
    val rows = Spectral.pcaTop(planted, iters = 8).collect()
    val fracs = rows.map(_.getDouble(3)).distinct
    assert(fracs.length == 1)
    assert(fracs.head > 0.99 && fracs.head <= 1.0)
    val eig = rows.map(_.getDouble(2)).distinct
    assert(eig.length == 1 && eig.head > 0)
  }

  test("projection scores recover the planted coordinates; residual is the noise") {
    val rows = Spectral.pcaProject(planted, iters = 8)
      .orderBy("vec_id").collect()
    // scores vary along the planted axis (range ~ the t spread)
    val scores = rows.map(_.getDouble(1))
    assert(scores.max - scores.min > 15.0)
    // residual energy is the orthogonal noise: |n| <= 0.2 -> resid <= ~0.05
    rows.foreach { r =>
      val resid = r.getDouble(2)
      assert(resid >= -1e-9 && resid < 0.1, s"resid $resid")
    }
    // no negative zero leaks through the +0.0 canonicalization
    assert(!rows.exists(r =>
      r.getDouble(1).toString == "-0.0" || r.getDouble(2).toString == "-0.0"))
  }

  test("eigenvalue matches the dominant eigenvalue of the 2x2 covariance") {
    val c = Spectral.covariance(planted).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val (a, b, d) = (c((1, 1)), c((1, 2)), c((2, 2)))
    val lamMax = ((a + d) + math.sqrt((a - d) * (a - d) + 4 * b * b)) / 2
    val got = Spectral.pcaTop(planted, iters = 8).head().getDouble(2)
    assert(math.abs(got - lamMax) / lamMax < 1e-4, s"got $got want $lamMax")
  }
}
