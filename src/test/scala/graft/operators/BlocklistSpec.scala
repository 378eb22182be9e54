package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class BlocklistSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(text: String, pats: Seq[String]): (Long, Long, Long, Int) = {
    val t = text.toLowerCase
    val occ = pats.zipWithIndex.flatMap { case (p0, pid) =>
      val p = p0.toLowerCase
      (0 to t.length - p.length)
        .filter(i => t.regionMatches(i, p, 0, p.length))
        .map(i => (i + 1L, pid))
    }
    if (occ.isEmpty) (0L, 0L, 0L, -1)
    else (occ.size.toLong, occ.map(_._2).distinct.size.toLong,
      occ.min._1, occ.min._2)
  }

  test("textbook ushers case: failure links emit he inside she, hers " +
      "after she") {
    val ac = Blocklist.compile(Seq("he", "she", "his", "hers"))
    // matches: she@2, he@3 (via fail link), hers@3
    assert(ac.scan("ushers") == ((3L, 3L, 2L, 1)))
  }

  test("overlapping occurrences all count") {
    val ac = Blocklist.compile(Seq("aa"))
    assert(ac.scan("aaaa")._1 == 3L)
    val ac2 = Blocklist.compile(Seq("aba"))
    assert(ac2.scan("ababa")._1 == 2L)
  }

  test("case-insensitive; null and miss are zero rows") {
    val ac = Blocklist.compile(Seq("Spark"))
    assert(ac.scan("SPARK spark SpArK")._1 == 3L)
    assert(ac.scan(null) == ((0L, 0L, 0L, -1)))
    assert(ac.scan("nothing here") == ((0L, 0L, 0L, -1)))
  }

  test("brute-force parity on random binary-alphabet text with " +
      "overlapping pattern set") {
    val pats = Seq("ab", "aba", "bab", "bb", "aab", "abab")
    val rnd = new scala.util.Random(42)
    val ac = Blocklist.compile(pats)
    (0 until 200).foreach { _ =>
      val t = (0 until rnd.nextInt(60)).map(_ =>
        if (rnd.nextBoolean()) 'a' else 'b').mkString
      assert(ac.scan(t) == brute(t, pats), s"text=$t")
    }
  }

  test("matchReport: DataFrame surface carries counts, first match " +
      "and the drop verdict") {
    val docs = Seq(
      (1L, "x customer part y customer z"), // customer part, customer x2
      (2L, "clean")).toDF("doc_id", "text")
    val r = Blocklist.matchReport(docs, "text",
        Seq("customer part", "customer"), maxHits = 3)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_hits") == 3L)
    assert(r(1L).getAs[Long]("n_patterns") == 2L)
    assert(r(1L).getAs[Long]("first_pos") == 3L)
    assert(r(1L).getAs[String]("first_pattern") == "customer part")
    assert(r(1L).getAs[Boolean]("drop_doc"))
    assert(r(2L).getAs[Long]("n_hits") == 0L)
    assert(!r(2L).getAs[Boolean]("drop_doc"))
  }
}
