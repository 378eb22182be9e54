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

  test("PQ: codes are total and in range; ADC ranks near-dups first") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val books = Similarity.pqTrain(emb, m = 4, k = 8, iters = 2)
    assert(books.length == 4 && books.forall(_.length == 8) &&
           books.forall(_.forall(_.length == 16)))
    val enc = Similarity.pqEncode(emb, books)
    assert(enc.count() == emb.count())
    val codeStats = enc.select(
      (0 until 4).map(s => max(col(s"code$s")).cast("int")) ++
      (0 until 4).map(s => min(col(s"code$s")).cast("int")): _*).head()
    (0 until 4).foreach { s =>
      assert(codeStats.getInt(s) <= 7 && codeStats.getInt(s + 4) >= 0)
    }
    // a planted exact copy of the query vector must come back at adc 0,
    // rank 1 — ADC of identical codes is the LUT sum at the query's own
    // codes, i.e. quantization distance only
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val planted = emb.filter(col("vec_id") === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val enc2 = Similarity.pqEncode(
      emb.select("vec_id", "embedding").unionByName(planted), books)
    val top = Similarity.pqSearch(enc2, books, q, k = 5,
        excludeId = Some(0L))
      .as[(Long, Double)].collect()
    assert(top.head._1 == 100000L, s"planted copy not rank 1: ${top.toSeq}")
    // NOTE: recall-vs-exact is NOT asserted on this fixture — uniform
    // random embeddings have concentrated pairwise distances, where any
    // m=4/k=8 quantizer scores at chance (measured 0.1 ≈ 10/99). The
    // planted-copy invariant above is the meaningful ADC property;
    // the adc value of an exact copy equals the query's own
    // quantization distance, strictly below any other code combination
    // chosen by argmin. q_ann_pq's oracle pins the arithmetic exactly.
  }

  test("semDedup: planted exact copy is dropped, original kept by id tie") {
    import org.apache.spark.sql.functions._
    val planted = emb.filter(col("vec_id") === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val out = Similarity
      .semDedup(emb.select("vec_id", "embedding").unionByName(planted),
        simThreshold = 0.99, kClusters = 4, iters = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getBoolean(3))).toMap
    // exact copy: same cluster, same cent_sim, cosine 1.0 — the pair is
    // above any threshold, so the id tie-break decides: 0 survives
    assert(out(0L)._1 == out(100000L)._1)
    assert(out(0L)._2 == out(100000L)._2)
    assert(out(0L)._3 && !out(100000L)._3)
    // nothing else in this fixture is within 0.99 cosine of anything
    assert(out.count(!_._2._3) == 1)
  }

  test("semDedup: oversized clusters fail loudly with advice") {
    val ex = intercept[IllegalArgumentException] {
      Similarity.semDedup(emb, simThreshold = 0.9, kClusters = 2,
        iters = 1, maxClusterSize = 3L)
    }
    assert(ex.getMessage.contains("raise kClusters"))
  }

  test("semDedup: impossible threshold keeps everything; rows are total") {
    val n = emb.count()
    val out = Similarity.semDedup(emb, simThreshold = 1.01,
      kClusters = 4, iters = 2)
    assert(out.count() == n)
    assert(out.filter("NOT kept").count() == 0)
  }

  test("randomProjection matches an independent JVM replay exactly") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 16
    val vecs = (0 until 40).map(i =>
      (i.toLong, Seq.fill(dim)((rnd.nextInt(2000) - 1000) / 997.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.randomProjection(df, outDim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    def sign(j: Long, i: Int): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j:$i".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xf) >= 8) 1L else -1L
    }
    vecs.foreach { case (id, v) =>
      (0 until 4).foreach { j =>
        val micro = v.zipWithIndex.map { case (x, i0) =>
          sign(j.toLong, i0 + 1) *
            BigDecimal(x.toDouble * 1000000.0)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        }.sum
        val want = BigDecimal(micro / 1000000.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(out((id, j.toLong)) == want, s"vec $id dim $j")
      }
    }
    // the signs must not be degenerate (all +1 would be a sum, not a
    // projection): both signs appear across the 4x16 table
    val signs = for (j <- 0 until 4; i <- 1 to dim) yield sign(j.toLong, i)
    assert(signs.contains(1L) && signs.contains(-1L))
  }

  test("mineBitext: mutual best-margin pairs, threshold gates, hub " +
      "deflation arithmetic") {
    val s = spark
    import s.implicits._
    // 2-D fixture, hand-checked: A0~B1, A2~B3, A4~B5 are the true
    // alignments; B7 points away from everything
    val a = Seq((0L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      (4L, Seq(0.6f, 0.8f))).toDF("vec_id", "embedding")
    val b = Seq((1L, Seq(0.995f, 0.1f)), (3L, Seq(0.08f, 0.997f)),
      (5L, Seq(0.707f, 0.707f)), (7L, Seq(-1.0f, 0.05f)))
      .toDF("vec_id", "embedding")
    val all = Similarity.mineBitext(a, b, k = 2, threshold = 1.0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(all.keySet == Set((0L, 1L), (2L, 3L), (4L, 5L)))
    // hand-computed (same 6dp-then-rank discipline)
    assert(math.abs(all((0L, 1L))._2 - 1.179569) < 2e-6)
    assert(math.abs(all((2L, 3L))._2 - 1.124377) < 2e-6)
    assert(math.abs(all((4L, 5L))._2 - 1.120983) < 2e-6)
    assert(math.abs(all((0L, 1L))._1 - 0.994988) < 2e-6)
    // a higher bar keeps only the sharpest alignment
    val strict = Similarity.mineBitext(a, b, k = 2, threshold = 1.15)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict == Set((0L, 1L)))
    // B7 is nobody's mutual best at any positive threshold
    assert(!all.keySet.exists(_._2 == 7L))
  }

  test("mineBitext: candidate restriction skips the cross join and " +
      "bounds the pair space") {
    val s = spark
    import s.implicits._
    val a = Seq((0L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val b = Seq((1L, Seq(0.99f, 0.14f)), (3L, Seq(0.05f, 0.99f)))
      .toDF("vec_id", "embedding")
    // only the (0,1) pair is a candidate: (2,3) cannot be mined
    val cands = Seq((0L, 1L)).toDF("a_id", "b_id")
    val out = Similarity.mineBitext(a, b, k = 2, threshold = 0.5,
        candidates = Some(cands))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((0L, 1L)))
  }

  test("mineContrastive: picks the hardest in-bucket positive and " +
      "negative with integer tie-breaks, skips anchors lacking either") {
    val s = spark
    import s.implicits._
    // dim-4 vectors engineered so all land in one bucket family by
    // similarity; labels: 0 for the first three, 1 for the next two,
    // and an isolated label-2 vector with no same-label peer
    def v(x: Double, y: Double) = Seq(x, y, 0.1, 0.1).map(_.toFloat)
    val rows = Seq(
      (0L, v(1.0, 0.0), 0),   // anchor of interest
      (1L, v(0.99, 0.14), 0), // closest same-label
      (2L, v(0.7, 0.7), 0),   // farther same-label
      (3L, v(0.95, 0.3), 1),  // hardest cross-label for 0
      (4L, v(0.1, 1.0), 1),
      (5L, v(0.5, 0.5), 2))   // no same-label peer -> no row
      .toDF("vec_id", "embedding", "label")
    // nPlanes = 0 is degenerate; use 1 plane so bucketing exists but
    // most vectors co-bucket (all have positive first coordinates)
    val got = Similarity.mineContrastive(rows, nPlanes = 1, dim = 4)
      .collect().map(r => r.getAs[Long]("anchor") -> r).toMap
    assert(!got.contains(5L), "label-2 anchor has no positive")
    val a0 = got(0L)
    assert(a0.getAs[Long]("pos_id") == 1L)
    assert(a0.getAs[Long]("neg_id") == 3L)
    assert(a0.getAs[Double]("pos_sim") > a0.getAs[Double]("neg_sim"))
    assert(math.abs(a0.getAs[Double]("margin") -
      (a0.getAs[Double]("pos_sim") - a0.getAs[Double]("neg_sim"))) < 2e-6)
    // determinism under different partitioning
    val got7 = Similarity
      .mineContrastive(rows.repartition(7), nPlanes = 1, dim = 4)
      .collect().map(r => (r.getAs[Long]("anchor"),
        r.getAs[Long]("pos_id"), r.getAs[Long]("neg_id"))).toSet
    assert(got7 == got.values.map(r => (r.getAs[Long]("anchor"),
      r.getAs[Long]("pos_id"), r.getAs[Long]("neg_id"))).toSet)
  }
}
