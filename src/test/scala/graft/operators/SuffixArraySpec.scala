package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** SuffixArray vs single-threaded brute force: the distributed
  * prefix-doubling build must reproduce the plain "sort every suffix
  * string" order, adjacentLcp the direct common-prefix walk, and
  * duplicateSpans the from-definition all-pairs formulation.
  */
class SuffixArraySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic pseudo-random corpus over a tiny alphabet — tiny
    * alphabets force deep rank ties, the regime prefix doubling exists
    * for. */
  private def corpus(nDocs: Int, maxDocLen: Int, alpha: String,
                     seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until nDocs).map { i =>
      val len = rnd.nextInt(maxDocLen + 1) // 0 .. maxDocLen, empties too
      (i.toLong, (0 until len).map(_ => alpha(rnd.nextInt(alpha.length)))
        .mkString)
    }
  }

  private def bruteSa(docs: Seq[(Long, String)],
                      maxLen: Int): Seq[(Long, Long, Long)] =
    docs.flatMap { case (id, t0) =>
      val t = t0.take(maxLen)
      (1 to t.length).map(p => (id, p.toLong, t.substring(p - 1)))
    }.sortBy { case (id, p, s) => (s, id, p) }
      .zipWithIndex
      .map { case ((id, p, _), i) => (id, p, i.toLong) }

  private def lcpOf(a: String, b: String): Long = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n && a.charAt(i) == b.charAt(i)) i += 1
    i.toLong
  }

  test("build matches brute-force suffix sort, ties by (doc, pos), " +
      "across alphabets, lengths and truncation") {
    for ((alpha, nDocs, maxDocLen, maxLen, seed) <- Seq(
        ("ab", 12, 40, 64, 1),        // deep ties, binary alphabet
        ("ab", 6, 120, 32, 2),        // truncation shorter than docs
        ("abcxyz ", 15, 60, 64, 3),   // wider alphabet with spaces
        ("a", 5, 30, 64, 4))) {       // degenerate: one letter, all ties
      val docs = corpus(nDocs, maxDocLen, alpha, seed)
      val got = SuffixArray.build(docs.toDF("doc_id", "text"),
          maxLen = maxLen)
        .as[(Long, Long, Long)].collect().sortBy(_._3)
      val want = bruteSa(docs, maxLen)
      assert(got.toSeq == want,
        s"mismatch for alpha=$alpha seed=$seed")
    }
  }

  test("adjacentLcp: exact common-prefix length of each consecutive " +
      "suffix pair, including prefix-of runs") {
    val docs = corpus(10, 50, "ab", 7)
    val maxLen = 64
    val suf = docs.flatMap { case (id, t0) =>
      val t = t0.take(maxLen)
      (1 to t.length).map(p => (id, p.toLong, t.substring(p - 1)))
    }.sortBy { case (id, p, s) => (s, id, p) }
    val want = suf.sliding(2).collect { case Seq(a, b) =>
      (a._1, a._2, b._1, b._2, lcpOf(a._3, b._3))
    }.toSeq
    val got = SuffixArray
      .adjacentLcp(docs.toDF("doc_id", "text"), maxLen = maxLen)
      .orderBy("sa")
      .select("doc_a", "pos_a", "doc_b", "pos_b", "lcp")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // the repetitive corpus must include a prefix-of pair (no mismatch
    // inside the shorter suffix) — the case a first-mismatch scan that
    // mishandles "not found" silently zeroes
    val prefixPairs = suf.sliding(2).count { case Seq(a, b) =>
      b._3.startsWith(a._3)
    }
    assert(prefixPairs > 0, "fixture lost its prefix-of coverage")
  }

  test("duplicateSpans == from-definition all-pairs spans " +
      "(max-LCP-vs-anyone >= minLen, union, merge)") {
    val docs = corpus(14, 60, "abc", 11)
    val maxLen = 64
    val minLen = 6
    // brute: every suffix's max lcp against EVERY other suffix
    val suf = docs.flatMap { case (id, t0) =>
      val t = t0.take(maxLen)
      (1 to t.length).map(p => (id, p.toLong, t.substring(p - 1)))
    }
    val covered = suf.flatMap { case (id, p, s) =>
      val m = suf.iterator.filter(o => (o._1, o._2) != ((id, p)))
        .map(o => lcpOf(s, o._3)).maxOption.getOrElse(0L)
      if (m >= minLen) Iterator.single((id, p, p + m)) else Iterator.empty
    }
    // merge per doc
    val want = covered.groupBy(_._1).toSeq.flatMap { case (id, ivs) =>
      val sorted = ivs.map(v => (v._2, v._3)).sortBy(_._1)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      for ((s, e) <- sorted) {
        if (out.nonEmpty && s <= out.last._2)
          out(out.length - 1) = (out.last._1, math.max(out.last._2, e))
        else out += ((s, e))
      }
      out.map { case (s, e) => (id, s, e) }
    }.sorted
    val got = SuffixArray
      .duplicateSpans(docs.toDF("doc_id", "text"), minLen = minLen,
        maxLen = maxLen)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got == want)
    assert(got.nonEmpty, "fixture produced no duplicated spans")
  }

  test("duplicateCoverage: clones score 1.0 and drop, unique docs " +
      "score 0.0 and keep") {
    val clone = "this exact block of text is long enough to be a span"
    val docs = Seq(
      (1L, clone), (2L, clone), // full clones -> coverage 1.0
      (3L, "entirely unique writing with no repeats whatsoever here"))
      .toDF("doc_id", "text")
    val got = SuffixArray
      .duplicateCoverage(docs, minLen = 20, dropFrac = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("dup_frac"), r.getAs[Boolean]("drop_doc"))))
      .toMap
    assert(got(1L) == ((1.0, true)) && got(2L) == ((1.0, true)))
    assert(got(3L) == ((0.0, false)))
  }

  test("longestRepeats: the top pair is a genuine corpus-wide longest " +
      "repeat and carries its text") {
    val shared = "xxqqzzyy_shared_block_xxqqzzyy"
    val docs = Seq(
      (1L, s"alpha $shared tail one"),
      (2L, s"beta $shared other tail"),
      (3L, "nothing in common here")).toDF("doc_id", "text")
    val top = SuffixArray.longestRepeats(docs, n = 3).collect()
    val first = top.head
    assert(first.getAs[Long]("lcp") >= shared.length)
    assert(first.getAs[String]("repeat_str").contains("shared_block"))
  }
}
