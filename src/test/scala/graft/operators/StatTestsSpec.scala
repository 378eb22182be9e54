package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class StatTestsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lens(xs: Int*) =
    xs.zipWithIndex.map { case (v, i) => (i.toLong, v.toLong) }
      .toDF("doc_id", "len")

  test("KS: identical distributions give D = 0") {
    val a = lens(10, 20, 20, 30)
    val r = CorpusStats.ksDrift(a, lens(10, 20, 20, 30), "len").head()
    assert(r.getAs[Long]("d_num") == 0L)
    assert(r.getAs[Double]("ks") == 0.0)
  }

  test("KS: disjoint supports give D = 1") {
    val r = CorpusStats.ksDrift(lens(1, 2, 3), lens(10, 11), "len").head()
    assert(r.getAs[Double]("ks") == 1.0)
    assert(r.getAs[Long]("d_num") == 3L * 2L)
  }

  test("KS: hand case — max gap in the middle of the support") {
    // P: {1,1,2}; Q: {2,3,3}. F at v=1: 2/3 vs 0 -> |2*3-0*3|=6
    // at v=2: 3/3 vs 1/3 -> |9-3|=6; at v=3: 1 vs 1 -> 0. D=6/9
    val r = CorpusStats.ksDrift(lens(1, 1, 2), lens(2, 3, 3), "len").head()
    assert(r.getAs[Long]("d_num") == 6L)
    assert(r.getAs[Double]("ks") == BigDecimal(6.0 / 9.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("Gini: equal counts -> 0; extreme concentration -> near 1") {
    val eq = (0 until 40).map(i => Tuple1((i % 4).toLong)).toDF("host")
    val r0 = CorpusStats.gini(eq, "host").head()
    assert(r0.getAs[Double]("gini") == 0.0)
    // one host owns 97 of 100 events across 4 hosts
    val sk = (Seq.fill(97)(0L) ++ Seq(1L, 2L, 3L)).map(Tuple1(_))
      .toDF("host")
    val r1 = CorpusStats.gini(sk, "host").head()
    assert(r1.getAs[Double]("gini") > 0.7, r1.toString)
  }

  test("featureHashProfile: collisions = distinct terms minus distinct buckets") {
    // 1-bit space: every term lands in bucket 0 or 1 -> n_features <= 2
    val docs = Seq((0L, "aa bb cc dd aa")).toDF("doc_id", "text")
    val r = CorpusStats.featureHashProfile(docs, bits = 1).head()
    assert(r.getAs[Long]("n_tokens") == 5L)
    assert(r.getAs[Long]("n_terms") == 4L)
    val nf = r.getAs[Long]("n_features")
    assert(nf >= 1L && nf <= 2L)
    assert(r.getAs[Long]("n_collisions") == 4L - nf)
    // a huge space: collisions vanish
    val r2 = CorpusStats.featureHashProfile(docs, bits = 22).head()
    assert(r2.getAs[Long]("n_collisions") == 0L)
  }

  test("burstWindows: a planted 10x hour is the only burst") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(hour: Int, i: Int) = new java.sql.Timestamp(
      base.getTime + hour * 3600000L + i * 1000L)
    // host 0: hours 0..4 have 2 events each, hour 5 has 20
    val rows = (0 until 5).flatMap(h => Seq((0L, at(h, 1)), (0L, at(h, 2)))) ++
      (0 until 20).map(i => (0L, at(5, i)))
    val r = CorpusStats.burstWindows(rows.toDF("host", "ts"), "host")
      .head()
    assert(r.getAs[Long]("n_windows") == 6L)
    assert(r.getAs[Long]("median_cnt") == 2L)
    assert(r.getAs[Long]("n_bursts") == 1L)
  }

  test("heapsLaw: exact-power vocabulary growth recovers its exponent") {
    // plant V(n) = n^0.5 exactly at the checkpoints: doc k introduces a
    // new term iff k is a perfect square -> V(n) = floor(sqrt(n));
    // with n = 100 docs every checkpoint (10,20,...,100) gives
    // V = floor(sqrt(n)) which is ~n^0.5 up to floor wiggle
    val docs = (1 to 100).map { k =>
      val root = math.sqrt(k).toInt
      val isSq = root * root == k
      val term = if (isSq) s"new$k" else s"old${(k % 3) + 1}"
      (k.toLong, s"$term old1")
    }.toDF("doc_id", "text")
    val r = CorpusStats.heapsLaw(docs).head()
    assert(r.getAs[Long]("n_docs") == 100L)
    // vocab = 10 squares + old1 old2 old3
    assert(r.getAs[Long]("vocab") == 13L)
    val beta = r.getAs[Double]("heaps_beta")
    assert(beta > 0.2 && beta < 0.6, s"beta $beta")
  }

  test("heapsLaw: closed vocabulary fits beta near zero") {
    val docs = (1 to 50).map(k => (k.toLong, "a b c"))
      .toDF("doc_id", "text")
    val r = CorpusStats.heapsLaw(docs).head()
    assert(r.getAs[Long]("vocab") == 3L)
    assert(math.abs(r.getAs[Double]("heaps_beta")) < 1e-9)
  }

  test("stopwordInduction: DF ranks by document frequency, IDF exact") {
    val docs = Seq(
      (0L, "the cat the mat"), (1L, "the dog"), (2L, "a dog runs"),
      (3L, "the a")).toDF("doc_id", "text")
    val rows = CorpusStats.stopwordInduction(docs, k = 3)
      .orderBy("rank").collect()
    // df: the=3 docs, a=2, dog=2, cat/mat/runs=1; top3 = the, a, dog
    assert(rows.map(_.getString(1)).toSeq == Seq("the", "a", "dog"))
    assert(rows.map(_.getLong(2)).toSeq == Seq(3L, 2L, 2L))
    val idfThe = math.round(math.log(4.0 / 3.0) * 1e8)
    assert(rows.head.getLong(3) == idfThe)
  }

  test("calibrationTable: bins partition ranks evenly; rates recover a monotone score") {
    // score = gold signal + small deterministic noise: top bins must be
    // purer than bottom bins
    val scored = (0 until 100).map { i =>
      val gold = i >= 50
      val score = (if (gold) 10.0 else 0.0) + (i % 7) * 0.1
      (i.toLong, score, gold, score > 5.0)
    }.toDF("doc_id", "llr", "__pos", "pred")
    val rows = Curation.calibrationTable(scored, "llr", "__pos", "pred",
      "doc_id", bins = 10).orderBy("decile").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("n")).forall(_ == 10L))
    assert(rows.take(5).forall(_.getAs[Double]("gold_rate") == 0.0))
    assert(rows.drop(5).forall(_.getAs[Double]("gold_rate") == 1.0))
  }

  test("Wilson: 2/2 must rank below 95/100") {
    val docs = (Seq.fill(2)(("tiny", 500L)) ++
      (0 until 100).map(i => ("big", if (i < 95) 500L else 100L)))
      .toDF("source", "n_chars")
    val m = CorpusStats
      .wilsonLowerBound(docs, "source", col("n_chars") >= 400)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("wilson_lb"))
      .toMap
    assert(m("tiny") < m("big"),
      s"tiny ${m("tiny")} must be below big ${m("big")}")
    // sanity: a perfect small sample still gets a positive bound
    assert(m("tiny") > 0.2 && m("tiny") < 0.9)
    assert(m("big") > 0.88 && m("big") < 0.95)
  }
}
