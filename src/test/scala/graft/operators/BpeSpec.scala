package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  test("train: hand-computed merges on the Sennrich-style corpus") {
    val s = spark
    import s.implicits._
    // low x3, lower, lowest, new, newer, newest, low (in docs)
    val docs = Seq(
      "low low lower lowest",
      "new newer newest low").toDF("text")
    val (merges, vocab) = Bpe.train(
      Bpe.wordCounts(docs, "text"), nMerges = 3)
    // pairs round 1: (l,o)=5 ties (o,w)=5 -> lexicographic (l,o)
    // round 2: (lo,w)=5; round 3: (e,w)=3 ties (low,</w>)=3, (n,e)=3,
    // (w,</w>)=3 -> (e,w)
    assert(merges.map(m => (m.rank, m.a, m.b, m.cnt)) == Seq(
      (1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "e", "w", 3L)))
    val seg = vocab.collect()
      .map(r => r.getAs[String]("word") -> r.getAs[String]("seg")).toMap
    assert(seg("low") == "low </w>")
    assert(seg("lower") == "low e r </w>")
    assert(seg("newest") == "n ew e s t </w>")
  }

  test("merge application is left-to-right non-overlapping (aaaa case)") {
    val s = spark
    import s.implicits._
    // "aaaa" under merge (a,a): the scan yields [aa, aa], NOT [aa, a, a]
    val seg = Seq("aaaa").toDF("word")
      .select(Bpe.segmentCol(col("word"),
        Seq(Bpe.Merge(1, "a", "a", 99L))).as("seg"))
      .head().getString(0)
    assert(seg == "aa aa </w>")
    // and the merged symbol does NOT cascade within the same merge:
    // "aaa" -> [aa, a], never [aaa]
    val seg3 = Seq("aaa").toDF("word")
      .select(Bpe.segmentCol(col("word"),
        Seq(Bpe.Merge(1, "a", "a", 99L))).as("seg"))
      .head().getString(0)
    assert(seg3 == "aa a </w>")
  }

  test("train stops early below minCount and on fully-merged vocab") {
    val s = spark
    import s.implicits._
    val docs = Seq("ab ab cd").toDF("text")
    // all pairs have count <= 2; minCount=3 learns nothing
    val (none, _) = Bpe.train(Bpe.wordCounts(docs, "text"),
      nMerges = 5, minCount = 3)
    assert(none.isEmpty)
    // minCount=1: "ab" merges a+b then ab+</w>, "cd" likewise; after
    // every word is ONE symbol there are no pairs left -> early stop
    // (also exercises the size>=2 guard on the pair extraction)
    val (all, vocab) = Bpe.train(Bpe.wordCounts(docs, "text"),
      nMerges = 50, minCount = 1)
    assert(all.size == 4)
    assert(vocab.select("seg").as[String].collect().toSet ==
      Set("ab</w>", "cd</w>"))
  }

  test("encode joins the segmented vocab back; counts are exact") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "low low new"), (2L, "lowest")).toDF("doc_id", "text")
    val merges = Seq(Bpe.Merge(1, "l", "o", 0L), Bpe.Merge(2, "lo", "w", 0L))
    val out = Bpe.encode(docs, "doc_id", "text", merges).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"))).toMap
    // low -> "low </w>" (2), new -> "n e w </w>" (4)
    assert(out(1L) == (3L, 2L + 2L + 4L))
    // lowest -> "low e s t </w>" (5)
    assert(out(2L) == (1L, 5L))
  }

  test("layout invariance: merges identical under different partitionings") {
    val s = spark
    import s.implicits._
    val docs = (0 until 60).map(i =>
      s"alpha beta gamma${i % 7} delta alpha beta").toDF("text")
    val w = Bpe.wordCounts(docs, "text")
    val (m1, _) = Bpe.train(w.repartition(1), nMerges = 6)
    val (m17, _) = Bpe.train(w.repartition(17), nMerges = 6)
    assert(m1 == m17)
  }
}
