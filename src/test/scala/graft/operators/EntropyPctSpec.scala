package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class EntropyPctSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hcond(text: String): (Long, Long) = {
    val r = CorpusStats.bigramCondEntropy(
      Seq((0L, text)).toDF("doc_id", "text")).head()
    (r.getAs[Long]("n_bigrams"), r.getAs[Long]("h_num_micro"))
  }

  test("deterministic sequences score zero conditional entropy") {
    // pure run and a 2-cycle: next char fully determined by current
    assert(hcond("a" * 50) == ((49L, 0L)))
    assert(hcond("ab" * 40) == ((79L, 0L)))
  }

  test("fair binary branching scores ln 2 per bigram") {
    // after 'a': b or c equally often; after b/c: always a
    val t = "abac" * 30 // bigrams: a->b, b->a, a->c, c->a ...
    val (n, micro) = hcond(t)
    val perBigram = micro.toDouble / n / 1e8
    // half the bigrams branch at ln2, half are deterministic
    assert(math.abs(perBigram - math.log(2.0) / 2) < 0.02,
      s"per-bigram $perBigram")
  }

  test("percentiles: exact order stats with known answers") {
    val docs = ((1 to 100).map(i => ("a", i.toLong)) ++
      Seq(("b", 7L), ("b", 5L), ("b", 9L))).toDF("source", "n_chars")
    val m = CorpusStats.lengthPercentiles(docs, "source", "n_chars")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(m("a") == ((100L, 50L, 90L, 99L)))
    // n=3: p50 -> ceil(1.5)=2nd (7), p90 -> ceil(2.7)=3rd (9), p99 -> 3rd
    assert(m("b") == ((3L, 7L, 9L, 9L)))
  }

  test("percentiles: singleton group takes its only value everywhere") {
    val m = CorpusStats.lengthPercentiles(
      Seq(("x", 42L)).toDF("source", "n_chars"), "source", "n_chars")
      .head()
    assert(m.getLong(1) == 1L && m.getLong(2) == 42L &&
      m.getLong(3) == 42L && m.getLong(4) == 42L)
  }
}
