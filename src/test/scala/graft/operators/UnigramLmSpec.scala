package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UnigramLmSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seg(word: String, vocab: Seq[UnigramLm.Piece])
      : (Seq[String], Long) = {
    val r = Seq(Tuple1(word)).toDF("word")
      .select(UnigramLm.segmentCol(col("word"), vocab).as("s"))
      .select($"s.seg", $"s.cost_micro").as[(Seq[String], Long)]
      .head()
    r
  }

  private def p(piece: String, cost: Long) = UnigramLm.Piece(piece, 1L, cost)

  test("Viterbi picks the cheapest path") {
    val vocab = Seq(p("a", 100), p("b", 100), p("ab", 150))
    assert(seg("abab", vocab) == ((Seq("ab", "ab"), 300L)))
    assert(seg("aab", vocab) == ((Seq("a", "ab"), 250L)))
  }

  test("equal-cost tie resolves to the SHORTEST last piece") {
    val vocab = Seq(p("a", 100), p("b", 100), p("ab", 200))
    // a|b and ab both cost 200; packed argmin must take l=1
    assert(seg("ab", vocab) == ((Seq("a", "b"), 200L)))
  }

  test("single-char fallback segments pieces absent from the vocab") {
    val vocab = Seq(p("x", 500), p("y", 500), p("z", 500))
    assert(seg("zyx", vocab) == ((Seq("z", "y", "x"), 1500L)))
  }

  test("trainVocab: single chars always present, frequent pieces cheap") {
    val docs = Seq(
      (1L, "banana banana banana band"),
      (2L, "ban ban banana")).toDF("doc_id", "text")
    val vocab = UnigramLm.trainVocab(docs, vocabSize = 16)
    val byPiece = vocab.map(v => v.piece -> v).toMap
    for (c <- "band".distinct)
      assert(byPiece.contains(c.toString), s"single char $c in vocab")
    // "an" occurs more often than "nd"; more frequent => cheaper
    assert(byPiece("an").cnt > byPiece("nd").cnt)
    assert(byPiece("an").costMicro < byPiece("nd").costMicro)
    assert(vocab.forall(_.costMicro >= 0))
  }

  test("encode reconstructs every word and numbers occurrences") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "a cat! A CAT.")).toDF("doc_id", "text")
    val vocab = UnigramLm.trainVocab(docs, vocabSize = 32)
    val rows = UnigramLm.encode(docs, vocab)
      .select("doc_id", "wi", "word", "seg", "n_pieces", "cost_micro")
      .as[(Long, Long, String, String, Long, Long)].collect()
    assert(rows.count(_._1 == 1L) == 6)
    assert(rows.count(_._1 == 2L) == 4, "lowercased [a-z]+ runs")
    rows.foreach { case (_, _, word, sg, n, cost) =>
      assert(sg.split('|').mkString == word, "pieces reconstruct word")
      assert(sg.split('|').length.toLong == n)
      assert(cost >= 0)
    }
    val wis = rows.filter(_._1 == 1L).map(_._2).sorted
    assert(wis.toSeq == (1L to 6L))
  }
}
