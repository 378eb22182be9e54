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

  test("sCurve: monotone S-shape, correct midpoint, matches closed form") {
    val rows = LshDedup.sCurve(spark, b = 8, r = 32, gridN = 20)
      .orderBy("k").collect()
    assert(rows.length == 19)
    val ps = rows.map(_.getAs[Double]("p_collide"))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b }, "monotone")
    rows.foreach { r =>
      val s = r.getAs[Long]("k") / 20.0
      val want = BigDecimal(1.0 - math.pow(1.0 - math.pow(s, 32), 8))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("p_collide") - want) <= 1e-6,
        s"s=$s got ${r.getAs[Double]("p_collide")} want $want")
    }
    val mid = rows.head.getAs[Double]("midpoint")
    assert(math.abs(mid - math.pow(1.0 / 8, 1.0 / 32)) < 1e-6)
    // the curve actually crosses 1/2 near the midpoint similarity
    val below = rows.filter(_.getAs[Double]("s") < mid - 0.05)
    val above = rows.filter(_.getAs[Double]("s") > mid + 0.05)
    assert(below.forall(_.getAs[Double]("p_collide") < 0.5))
    assert(above.forall(_.getAs[Double]("p_collide") > 0.5))
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
