package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** IVF-ANN invariants over the driver's embeddings fixture: the
  * deterministic quantizer reproduces itself, covers every vector, and
  * probing a fraction of the lists recovers most of the exact top-k
  * (the recall/cost contract of the scale path).
  */
class SimilaritySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def emb = graft.Sessions.table(spark, dir, "embeddings")

  test("ivf centroids are deterministic and assignment is total") {
    val c1 = Similarity.ivfCentroids(emb, k = 8, iters = 3)
    val c2 = Similarity.ivfCentroids(emb, k = 8, iters = 3)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    assert(c1.length == 8 && c1.forall(_.length == 64))
    import org.apache.spark.sql.functions._
    val lists = emb
      .withColumn("list_id",
        Similarity.assignListCol(col("embedding").cast("array<double>"), c1))
      .groupBy("list_id").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(lists.values.sum == emb.count())
    assert(lists.keys.forall(k => k >= 0 && k < 8))
  }

  test("ivf probe recovers most of the exact cosine top-k") {
    val q = emb.filter("vec_id = 0")
      .select(org.apache.spark.sql.functions.col("embedding")
        .cast("array<double>")).head().getSeq[Double](0)
    val exact = Similarity
      .bruteForceTopK(emb.filter("vec_id <> 0"), q, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = Similarity
      .ivfSearch(emb, queryVecId = 0, k = 10, kLists = 8, nProbe = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall too low: $recall (ivf=$ivf exact=$exact)")
    // full probe = exact: probing every list must reproduce brute force
    val full = Similarity
      .ivfSearch(emb, queryVecId = 0, k = 10, kLists = 8, nProbe = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(full == exact)
  }
}
