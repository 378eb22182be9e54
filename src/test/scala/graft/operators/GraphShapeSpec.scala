package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class GraphShapeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bowtie: textbook shape classifies every part") {
    // IN: 1 -> 2 -> core; CORE: 3 <-> 4; OUT: core -> 5 -> 6;
    // OTHER: 7 -> 8 (disconnected), 9 tendril off IN (1 -> 9)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 3L), (4L, 5L), (5L, 6L),
      (7L, 8L), (1L, 9L)).toDF("src", "dst")
    val m = HostRank.bowtie(edges).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(m(3L) == "core" && m(4L) == "core")
    assert(m(1L) == "in" && m(2L) == "in")
    assert(m(5L) == "out" && m(6L) == "out")
    assert(m(7L) == "other" && m(8L) == "other" && m(9L) == "other")
  }

  test("bowtie: all-one-SCC graph is all core") {
    val ring = (0L until 5L).map(i => (i, (i + 1) % 5))
    val m = HostRank.bowtie(ring.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(m.size == 5 && m.values.forall(_ == "core"))
  }

  test("mixingStats: full ring has reciprocity 0 and a 2-cycle chain 1") {
    val ring = (0L until 6L).map(i => (i, (i + 1) % 6)).toDF("src", "dst")
    val r1 = HostRank.mixingStats(ring).head()
    assert(r1.getAs[Long]("n_edges") == 6L)
    assert(r1.getAs[Long]("n_reciprocal") == 0L)
    assert(r1.getAs[Double]("reciprocity") == 0.0)
    val both = (0L until 4L).flatMap(i =>
      Seq((i, (i + 1) % 4), ((i + 1) % 4, i))).toDF("src", "dst")
    val r2 = HostRank.mixingStats(both).head()
    assert(r2.getAs[Long]("n_reciprocal") == 8L)
    assert(r2.getAs[Double]("reciprocity") == 1.0)
    // regular graph: zero degree variance -> assortativity 0 by rule
    assert(r2.getAs[Double]("assortativity") == 0.0)
  }

  test("mixingStats: star graph is perfectly disassortative-shaped Pearson") {
    // hub 0 -> leaves, one leaf pair edge to break zero variance
    val edges = ((1L to 5L).map(l => (0L, l)) :+ (1L, 2L))
      .toDF("src", "dst")
    val r = HostRank.mixingStats(edges).head()
    // hand Pearson over edges of (out(src), in(dst)):
    // edges (0,l): x=5,y=1 for l in 3..5; y=2 for l=1? in(1)=1, in(2)=2
    val xy = Seq((5, 1), (5, 2), (5, 1), (5, 1), (5, 1), (1, 2))
    val m = xy.length.toLong
    val sx = xy.map(_._1).sum.toLong; val sy = xy.map(_._2).sum.toLong
    val sxy = xy.map(p => p._1 * p._2).sum.toLong
    val sxx = xy.map(p => p._1 * p._1).sum.toLong
    val syy = xy.map(p => p._2 * p._2).sum.toLong
    val want = BigDecimal(
      (m * sxy - sx * sy).toDouble /
        math.sqrt(((m * sxx - sx * sx) * (m * syy - sy * sy)).toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("assortativity") == want,
      s"got ${r.getAs[Double]("assortativity")} want $want")
  }

  test("silhouette: separated blobs score near 1, counts match") {
    val emb = (0 until 30).map { i =>
      val b = i % 3
      val v = Array.fill(4)(0.0f)
      v(b) = (100.0 + (i % 5)).toFloat
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val rows = Similarity.silhouette(emb, kClusters = 3, iters = 3)
      .collect()
    assert(rows.map(_.getAs[Long]("n")).sum == 30L)
    rows.foreach { r =>
      val mean = r.getAs[Long]("sil_micro").toDouble /
        r.getAs[Long]("n") / 1e8
      assert(mean > 0.9, s"cid ${r.get(0)} mean $mean")
    }
  }

  test("silhouette: a point equidistant-ish between clusters scores low") {
    // two tight blobs + one midpoint straggler
    val pts = Seq.tabulate(10)(i => (i.toLong, Array(0.0f + i * 0.01f, 0f))) ++
      Seq.tabulate(10)(i => (10L + i, Array(10.0f + i * 0.01f, 0f))) :+
      (20L, Array(5.0f, 0f))
    val emb = pts.toDF("vec_id", "embedding")
    val rows = Similarity.silhouette(emb, kClusters = 2, iters = 3)
      .collect()
    val means = rows.map(r =>
      r.getAs[Long]("sil_micro").toDouble / r.getAs[Long]("n") / 1e8)
    // the cluster holding the straggler averages visibly below the other
    assert(means.max > 0.9 && means.min < means.max - 0.02)
  }
}
