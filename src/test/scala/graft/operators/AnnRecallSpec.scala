package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class AnnRecallSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 30 deterministic vectors in 3 well-separated blobs (dim 4): block b
  // centered at 10*b on axis b, small per-id jitter on every axis.
  private lazy val emb = (0 until 30).map { i =>
    val b = i % 3
    val base = Array.fill(4)(0.0)
    base(b) = 10.0
    val v = base.zipWithIndex.map { case (x, d) =>
      (x + ((i * 7 + d * 3) % 5) * 0.1).toFloat
    }
    (i.toLong, v)
  }.toDF("vec_id", "embedding")

  test("probing every list reproduces exact ground truth: recall 1.0") {
    val r = Similarity.annRecallEval(emb, nQueries = 6, k = 5,
      kLists = 3, nProbe = 3, iters = 2).collect()
    assert(r.length == 6)
    r.foreach { row =>
      assert(row.getLong(1) == 5L, s"qid=${row.get(0)} hits=${row.get(1)}")
      assert(row.getDouble(2) == 1.0)
    }
  }

  test("hits bounded by k and recall = hits/k") {
    val r = Similarity.annRecallEval(emb, nQueries = 6, k = 5,
      kLists = 3, nProbe = 1, iters = 2).collect()
    r.foreach { row =>
      val hits = row.getLong(1)
      assert(hits >= 0L && hits <= 5L)
      assert(math.abs(row.getDouble(2) - hits / 5.0) < 1e-9)
    }
  }

  test("single-probe recall stays high inside well-separated blobs") {
    // nearest neighbors of a blob member are its own blob: one probe
    // (the home list) should already find most of the true top-k
    val r = Similarity.annRecallEval(emb, nQueries = 6, k = 5,
      kLists = 3, nProbe = 1, iters = 3).collect()
    val mean = r.map(_.getDouble(2)).sum / r.length
    assert(mean > 0.8, s"mean recall $mean")
  }
}
