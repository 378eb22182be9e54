package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The library retrieval/quality API (the promoted, parameterized forms
  * of q_bm25_search / q_quality_gopher) — exercised with NON-default
  * parameters against independently hand-computed expectations, so the
  * operator's knobs are verified, not just the oracle defaults.
  */
class RetrievalSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private val corpus = Seq(
    (1L, "join scan join filter"),          // dl=4
    (2L, "scan scan scan scan scan scan"),  // dl=6
    (3L, "window filter order group"),      // dl=4
    (4L, "filter filter filter filter filter filter") // dl=6
  )

  /** Scalar BM25 reference, written from the formula (not the plan). */
  private def bm25Ref(tfs: Map[Long, Map[String, Int]], dls: Map[Long, Int],
                      terms: Seq[String], k1: Double, b: Double)
      : Map[Long, Double] = {
    val n = dls.size.toDouble
    val avgdl = dls.values.sum.toDouble / n
    val df = terms.map(t => t -> tfs.count(_._2.contains(t))).toMap
    tfs.map { case (id, tf) =>
      val s = terms.map { t =>
        val f = tf.getOrElse(t, 0).toDouble
        if (f == 0) 0.0
        else {
          val idf = BigDecimal(math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          idf * f * (k1 + 1.0) /
            (f + k1 * (1.0 - b + b * dls(id) / avgdl))
        }
      }.sum
      id -> BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
  }

  test("bm25 with non-default k1/b matches the formula") {
    val s = spark
    import s.implicits._
    val terms = Seq("join", "scan", "window")
    val params = Retrieval.Bm25Params(k1 = 2.0, b = 0.5)
    val got = Retrieval
      .bm25(corpus.toDF("doc_id", "text"), terms, params, limit = 10,
        idCol = "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val tfs = Map(
      1L -> Map("join" -> 2, "scan" -> 1),
      2L -> Map("scan" -> 6),
      3L -> Map("window" -> 1))
    val want = bm25Ref(tfs, Map(1L -> 4, 2L -> 6, 3L -> 4, 4L -> 6),
      terms, k1 = 2.0, b = 0.5)
    assert(got.keySet == tfs.keySet) // doc 4 matches no term -> absent
    for ((id, w) <- want if tfs.contains(id))
      assert(math.abs(got(id) - w) < 1e-9, s"doc $id: ${got(id)} vs $w")
  }

  test("bm25 ranking: higher tf wins under equal dl; limit applies") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "term term term pad pad pad"),
      (2L, "term pad pad pad pad pad"),
      (3L, "pad pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val rows = Retrieval.bm25(df, Seq("term"), limit = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(1L))
  }

  test("gopherQuality with tightened thresholds flips the verdict") {
    val s = spark
    import s.implicits._
    // 12 distinct words, mean word length 4.0, top-word frac 1/12
    val text = ("alfa brav chrl delt echo foxt golf hotl "
      + "indi juln kilo lima")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val default = Retrieval.gopherQuality(df).collect().head
    assert(default.getAs[Boolean]("pass"))
    assert(default.getAs[Long]("n_words") == 12L)
    assert(default.getAs[Double]("mean_word_len") == 4.0)
    // same doc fails once minWords demands more than it has…
    val tight = Retrieval.gopherQuality(df,
      Retrieval.GopherParams(minWords = 13L)).collect().head
    assert(!tight.getAs[Boolean]("pass"))
    // …or once the mean-word-length band excludes 4.0
    val band = Retrieval.gopherQuality(df,
      Retrieval.GopherParams(minMeanWordLen = 4.5)).collect().head
    assert(!band.getAs[Boolean]("pass"))
  }

  test("gopherQuality verdict uses unrounded ratios at the boundary") {
    val s = spark
    import s.implicits._
    // ttr = 2/7 = 0.285714… rounds to 0.2857 for display; a threshold
    // of 0.2857 must still FAIL the doc because the raw ratio is below
    // the displayed rounding.
    val df = Seq((1L, "a a a a a b b")).toDF("doc_id", "text")
    val r = Retrieval.gopherQuality(df,
      Retrieval.GopherParams(minWords = 1L, minTypeTokenRatio = 0.2857,
        maxTopWordFrac = 1.0)).collect().head
    assert(r.getAs[Double]("ttr") == 0.2857)
    assert(!r.getAs[Boolean]("pass"))
  }

  test("bm25Indexed == bm25 on the same corpus, and the probe prunes " +
       "to the terms' bucket partitions") {
    val s = spark
    import s.implicits._
    val docs = (0 until 200).map { i =>
      val extra = if (i % 7 == 0) " join scan" else if (i % 5 == 0) " scan"
                  else ""
      (i.toLong, s"alpha w$i beta w${i * 3} gamma$extra join")
    }.toDF("doc_id", "text")
    val direct = Retrieval.bm25(docs, Seq("join", "scan"), limit = 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val idx = java.nio.file.Files
      .createTempDirectory("bm25-idx").toString
    Retrieval.bm25Build(docs, idx)
    val viaIdx = Retrieval.bm25Indexed(s, idx, Seq("join", "scan"),
      limit = 15)
    val got = viaIdx.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == direct)
    // file-listing pruning: the scan must read <= 2 bucket partitions
    assert("PartitionFilters: \\[[^\\]]*bucket".r
      .findFirstIn(viaIdx.queryExecution.executedPlan.toString).isDefined)
    // every scan in this plan reads the postings (the stats parquet was
    // consumed driver-side) — all of them must be bucket-pruned.
    // (AQE nodes count as leaves; recurse into their final plans.)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.flatMap {
      case f: FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case _ => Nil
    }
    val parts = scans(viaIdx.queryExecution.executedPlan)
      .map(_.selectedPartitions.partitionCount)
    assert(parts.nonEmpty && parts.forall(_ <= 2),
      s"query must read <= 2 of 64 bucket partitions, got $parts")
  }

  test("bm25Append: incremental index == full rebuild, bit for bit") {
    val s = spark
    import s.implicits._
    val extra = Seq(
      (5L, "scan join scan window"),
      (6L, "window window order join"))
    val all = (corpus ++ extra).toDF("doc_id", "text")
    val idxInc = java.nio.file.Files
      .createTempDirectory("bm25-inc").toString
    val idxFull = java.nio.file.Files
      .createTempDirectory("bm25-full").toString
    Retrieval.bm25Build(corpus.toDF("doc_id", "text"), idxInc)
    Retrieval.bm25Append(s, extra.toDF("doc_id", "text"), idxInc)
    Retrieval.bm25Build(all, idxFull)
    val terms = Seq("join", "scan", "window")
    val inc  = Retrieval.bm25Indexed(s, idxInc, terms).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val full = Retrieval.bm25Indexed(s, idxFull, terms).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val direct = Retrieval.bm25(all, terms).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(inc == full)
    assert(inc == direct)
  }

  test("phraseSearch: adjacency, overlap counting, 1-based first_pos") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c a b c"),   // "a b" at 1 and 4
      (2L, "b a b"),         // "a b" at 2
      (3L, "a a a"),         // "a a" overlaps: 1 and 2; no "a b"
      (4L, "c b a")          // reversed -> no match
    ).toDF("doc_id", "text")
    val ab = Retrieval.phraseSearch(docs, Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ab == Map(1L -> (2L, 1L), 2L -> (1L, 2L)))
    val aa = Retrieval.phraseSearch(docs, Seq("a", "a"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(aa == Map(3L -> (2L, 1L)))
    val abc = Retrieval.phraseSearch(docs, Seq("a", "b", "c"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(abc == Map(1L -> (2L, 1L)))
  }

  test("pmiBigrams matches a hand-computed PMI and honors minCount") {
    val s = spark
    import s.implicits._
    // "x y" always adjacent (cxy=4); "p q" adjacent twice but below
    // minCount=3; unigrams: x=4 y=4 p=2 q=2 z=4 -> Nu=16, Nb=12
    val docs = Seq(
      (1L, "x y p q"), (2L, "x y z z"),
      (3L, "x y p q"), (4L, "x y z z")
    ).toDF("doc_id", "text")
    val got = Retrieval.pmiBigrams(docs, minCount = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // pmi(x,y) = ln((4 * 16 * 16) / ((4 * 4) * 12)) = ln(16/3)
    val want = BigDecimal(math.log((4.0 * 16 * 16) / ((4.0 * 4) * 12)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(("x", "y"))._1 == 4L)
    assert(got(("x", "y"))._2 == want)
    assert(!got.contains(("p", "q")), "minCount=3 must drop cxy=2")
  }

  test("termBucket JVM twin matches termBucketCol") {
    val s = spark
    import s.implicits._
    val words = (0 until 500).map(i => s"word$i")
    val got = words.toDF("w")
      .select(col("w"), Retrieval.termBucketCol(col("w"), 64).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach(w => assert(got(w) == Retrieval.termBucket(w, 64), w))
  }
}
