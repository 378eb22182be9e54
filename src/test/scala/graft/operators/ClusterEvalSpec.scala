package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ClusterEvalSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 separated blobs whose label matches the blob -> perfect external
  // agreement once k-means finds them
  private lazy val labeled = (0 until 30).map { i =>
    val b = i % 3
    val v = Array.fill(4)(0.0f)
    v(b) = (100.0 + (i % 5)).toFloat
    (i.toLong, v, s"L$b")
  }.toDF("vec_id", "embedding", "label")

  test("pure clustering: purity 1 and NMI 1") {
    val r = Similarity.clusterPurity(labeled, kClusters = 3, iters = 3)
      .head()
    assert(r.getAs[Long]("n") == 30L)
    assert(r.getAs[Long]("purity_num") == 30L)
    assert(r.getAs[Double]("purity") == 1.0)
    assert(math.abs(r.getAs[Double]("nmi") - 1.0) < 1e-4,
      s"nmi ${r.getAs[Double]("nmi")}")
  }

  test("labels independent of clusters: NMI collapses toward 0") {
    // same geometry, labels assigned orthogonally to the blobs
    val shuffledLabels = (0 until 30).map { i =>
      val b = i % 3
      val v = Array.fill(4)(0.0f)
      v(b) = (100.0 + (i % 5)).toFloat
      (i.toLong, v, s"L${(i / 3) % 3}")
    }.toDF("vec_id", "embedding", "label")
    val r = Similarity.clusterPurity(shuffledLabels, kClusters = 3,
      iters = 3).head()
    assert(r.getAs[Double]("nmi") < 0.1,
      s"nmi ${r.getAs[Double]("nmi")}")
    assert(r.getAs[Double]("purity") < 0.6)
  }

  test("spearman: identical, reversed, and known-d2 rankings") {
    val same = Seq((1L, 30L, 300L), (2L, 20L, 200L), (3L, 10L, 100L))
      .toDF("host", "a", "b")
    val r1 = HostRank.spearman(same, "host", "a", "b").head()
    assert(r1.getAs[Double]("rho") == 1.0 &&
      r1.getAs[Long]("sum_d2") == 0L)
    val rev = Seq((1L, 30L, 100L), (2L, 20L, 200L), (3L, 10L, 300L))
      .toDF("host", "a", "b")
    val r2 = HostRank.spearman(rev, "host", "a", "b").head()
    assert(r2.getAs[Double]("rho") == -1.0)
    // hand case: n=4, one adjacent swap -> sum_d2 = 2, rho = 1 - 12/60
    val swap = Seq((1L, 40L, 400L), (2L, 30L, 200L), (3L, 20L, 300L),
      (4L, 10L, 100L)).toDF("host", "a", "b")
    val r3 = HostRank.spearman(swap, "host", "a", "b").head()
    assert(r3.getAs[Long]("sum_d2") == 2L)
    assert(r3.getAs[Double]("rho") == 0.8)
  }
}
