package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed stupid-backoff scores: every branch of the three-way
  * CASE (seen bigram, unigram backoff, OOV floor) is pinned against
  * arithmetic done by hand, including the <s> sentinel context, model
  * pruning and the micro-unit reduction.
  */
class NgramLMSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // corpus: "a b" x2, "a c" x1  =>  pairs: (<s>,a)x3, (a,b)x2, (a,c)x1
  // totals: N = 6 tokens; unigrams: a=3, b=2, c=1
  private def corpus = {
    import spark.implicits._
    Seq((0L, "a b"), (1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
  }

  test("train: counts, pruning and marginals") {
    val m = NgramLM.train(corpus, minCount = 2L)
    val big = m.bigrams.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // (a,c) count 1 pruned; sentinel context trained like any other
    assert(big == Set(("<s>", "a", 3L), ("a", "b", 2L)))
    val ctx = m.contexts.collect().map(r =>
      (r.getString(0), r.getLong(1))).toMap
    // marginals over the UNPRUNED table: a's contexts include the
    // pruned (a,c)
    assert(ctx == Map("<s>" -> 3L, "a" -> 3L))
    val uni = m.unigrams.collect().map(r =>
      (r.getString(0), r.getLong(1))).toMap
    assert(uni == Map("a" -> 3L, "b" -> 2L)) // c=1 pruned
    assert(m.totals.head().getDouble(0) == 6.0)
  }

  test("score: every backoff branch, by hand") {
    import spark.implicits._
    val m = NgramLM.train(corpus, minCount = 2L)
    val p = NgramLM.Params(minCount = 2L)
    // doc X: "a b"    -> (<s>,a): log10(3/3)=0; (a,b): log10(2/3)
    // doc Y: "a c"    -> 0; (a,c) pruned -> backoff: log10(0.4*... c=1
    //                    pruned from unigrams too -> OOV: log10(0.4/6)
    // doc Z: "b a"    -> (<s>,b) unseen, b unigram=2: log10(0.4*2/6);
    //                    (b,a) unseen, a=3: log10(0.4*3/6)
    val scored = NgramLM.score(
      Seq((10L, "a b"), (11L, "a c"), (12L, "b a")).toDF("doc_id", "text"),
      m, p)
      .select($"doc_id", $"n_tokens", $"nll").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def lp6(x: Double) = math.rint(math.log10(x) * 1e6) / 1e6
    def nll(lps: Seq[Double]) =
      math.rint(-lps.map(x => math.rint(x * 1e6)).sum / 1e6 / lps.size
        * 1e4) / 1e4
    assert(scored(10L) == ((2L, nll(Seq(lp6(1.0), lp6(2.0 / 3))))))
    assert(scored(11L) == ((2L, nll(Seq(lp6(1.0), lp6(0.4 / 6))))))
    assert(scored(12L) == ((2L,
      nll(Seq(lp6(0.4 * 2 / 6), lp6(0.4 * 3 / 6))))))
  }

  test("bucketed: thresholds compare the unrounded mean") {
    import spark.implicits._
    val m = NgramLM.train(corpus, minCount = 2L)
    // doc 10 ("a b") has nll ~0.088; doc 11 ~0.588; split them
    val p = NgramLM.Params(minCount = 2L, headMax = 0.3, midMax = 0.7)
    val bf = NgramLM.bucketed(NgramLM.score(
        Seq((10L, "a b"), (11L, "a c"), (12L, "x y")).toDF("doc_id", "text"),
        m, p), p)
    assert(!bf.columns.contains("__nll_raw"))
    val b = bf.select($"doc_id", $"bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(b(10L) == "head")
    assert(b(11L) == "middle")
    assert(b(12L) == "tail") // all-OOV: nll = -log10(0.4/6) ~ 1.176
  }

  // trigram corpus: "a b c" x2, "a b d" x1
  // triples: (<s>,<s>,a)x3, (<s>,a,b)x3, (a,b,c)x2, (a,b,d)x1
  // pairs:   (<s>,a)x3, (a,b)x3, (b,c)x2, (b,d)x1; N=9
  // unigrams: a=3, b=3, c=2, d=1
  private def corpus3 = {
    import spark.implicits._
    Seq((0L, "a b c"), (1L, "a b c"), (2L, "a b d"))
      .toDF("doc_id", "text")
  }

  test("train3: trigram counts, pruning and marginals") {
    val m = NgramLM.train3(corpus3, minCount = 2L)
    val tri = m.trigrams.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(tri == Set(("<s>", "<s>", "a", 3L), ("<s>", "a", "b", 3L),
      ("a", "b", "c", 2L))) // (a,b,d) count 1 pruned
    val ctx3 = m.contexts3.collect().map(r =>
      ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // unpruned marginals: (a,b) context covers the pruned (a,b,d)
    assert(ctx3 == Map(("<s>", "<s>") -> 3L, ("<s>", "a") -> 3L,
      ("a", "b") -> 3L))
  }

  test("score3: every backoff level, by hand") {
    import spark.implicits._
    val m = NgramLM.train3(corpus3, minCount = 2L)
    val p = NgramLM.Params(minCount = 2L)
    def lp6(x: Double) = math.rint(math.log10(x) * 1e6) / 1e6
    def nll(lps: Seq[Double]) =
      math.rint(-lps.map(x => math.rint(x * 1e6)).sum / 1e6 / lps.size
        * 1e4) / 1e4
    val scored = NgramLM.score3(
      Seq((20L, "a b c"), (21L, "a b d"), (22L, "b c z"))
        .toDF("doc_id", "text"), m, p)
      .select($"doc_id", $"nll").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 20: (<s>,<s>,a)=3/3; (<s>,a,b)=3/3; (a,b,c)=2/3
    assert(scored(20L) == nll(Seq(lp6(1.0), lp6(1.0), lp6(2.0 / 3))))
    // doc 21: ..., (a,b,d) pruned -> bigram (b,d) pruned -> unigram d
    //   pruned -> OOV floor alpha*(alpha/9)
    assert(scored(21L) == nll(Seq(lp6(1.0), lp6(1.0),
      lp6(0.4 * (0.4 / 9)))))
    // doc 22: (<s>,<s>,b) unseen -> bigram (<s>,b) unseen -> unigram
    //   b=3: alpha*(alpha*3/9); (<s>,b,c) unseen -> bigram (b,c)=2 of
    //   cc(b)=3: alpha*2/3; (b,c,z) unseen -> (c,z) unseen -> z OOV
    assert(scored(22L) == nll(Seq(lp6(0.4 * (0.4 * 3 / 9)),
      lp6(0.4 * 2 / 3), lp6(0.4 * (0.4 / 9)))))
  }

  test("triples: single-token doc gets one double-sentinel row") {
    import spark.implicits._
    val rows = NgramLM.triples(Seq((7L, "x")).toDF("doc_id", "text"))
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3)))
    assert(rows.toSeq == Seq(("<s>", "<s>", "x")))
  }

  test("single-token and empty-ish docs score through the sentinel") {
    import spark.implicits._
    val m = NgramLM.train(corpus, minCount = 2L)
    val one = NgramLM.score(Seq((5L, "a")).toDF("doc_id", "text"), m)
      .select($"n_tokens", $"nll").head()
    assert(one.getLong(0) == 1L)
    assert(one.getDouble(1) == 0.0) // (<s>,a) = 3/3 -> log10 1 = 0
  }
}
