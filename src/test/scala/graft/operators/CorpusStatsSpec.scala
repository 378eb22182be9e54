package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class CorpusStatsSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  test("readability: word/sentence/syllable counts and Flesch on a " +
      "hand-counted page") {
    val s = spark
    import s.implicits._
    // "the cat sat on the mat." -> 6 words, 1 sentence, 6 syllables
    // "rhythm gym!" -> no-vowel-group words still count 1 syllable each
    val df = Seq(
      (1L, "the cat sat on the mat."),
      (2L, "rhythm gym crwth!"),
      (3L, "is this readable? yes. truly great stuff!")
    ).toDF("doc_id", "text")
    val out = CorpusStats.readability(df, "text")
      .select("doc_id", "n_words", "n_sentences", "n_syllables", "flesch",
        "ttr")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(out(1L)._1 == 6L && out(1L)._2 == 1L && out(1L)._3 == 6L)
    // flesch = 206.835 - 1.015*(6/1) - 84.6*(6/6) = 116.145
    assert(math.abs(out(1L)._4 - 116.145) < 1e-9)
    // "the" repeats -> 5 distinct of 6
    assert(math.abs(out(1L)._5 - 0.8333) < 1e-9)
    // rhythm=1 (y group), gym=1 (y), crwth=1 (floored) -> 3 syllables
    assert(out(2L)._1 == 3L && out(2L)._2 == 1L && out(2L)._3 == 3L)
    // three terminal runs: "?", ".", "!"
    assert(out(3L)._2 == 3L)
  }

  test("readability: punctuation-free text counts one sentence") {
    val s = spark
    import s.implicits._
    val r = CorpusStats.readability(
        Seq((1L, "no terminal punctuation at all")).toDF("doc_id", "text"),
        "text")
      .select("n_sentences").head()
    assert(r.getLong(0) == 1L)
  }

  test("distributionDrift: chi-square terms and the verdict ladder") {
    val s = spark
    import s.implicits._
    // prev: a=50, b=50, c=10; cur: a=55, b=99, d=6 (c gone, d new)
    val prev = (Seq.fill(50)("a") ++ Seq.fill(50)("b") ++
      Seq.fill(10)("c")).toDF("k")
    val cur = (Seq.fill(55)("a") ++ Seq.fill(99)("b") ++
      Seq.fill(6)("d")).toDF("k")
    val out = CorpusStats.distributionDrift(prev, cur, "k")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          r.getString(5)))).toMap
    // totals 110 -> 160; exp(a) = 50*160/110 = 72.7273
    // chi2(a) = (195/11)^2 / (800/11) = 38025/8800 = 4.321023 -> drifted
    assert(out("a")._4 == "drifted")
    assert(math.abs(out("a")._3.get - 4.321023) < 1e-5)
    // exp(b) = 72.7273, chi2 = (99-72.7273)^2/72.7273 = 9.49 -> drifted
    assert(out("b")._4 == "drifted")
    assert(out("c") == ((10L, 0L, out("c")._3, "gone")))
    assert(out("d")._1 == 0L && out("d")._3.isEmpty &&
      out("d")._4 == "new")
    // a stable case: identical distributions
    val same = CorpusStats.distributionDrift(prev, prev, "k")
      .collect().map(_.getString(5)).toSet
    assert(same == Set("stable"), "identical dumps must read stable")
  }

  test("charEntropy: hand-computed bits for degenerate, uniform and " +
      "mixed strings") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "aaaaaaaa"),       // one symbol -> 0 bits
      (2L, "abababab"),       // two equiprobable -> 1 bit
      (3L, "abcd"),           // four equiprobable -> 2 bits
      (4L, "aab")             // p = 2/3, 1/3 -> ~0.9183
    ).toDF("doc_id", "text")
    val out = CorpusStats.charEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((8L, 1L, 0.0)))
    assert(out(2L) == ((8L, 2L, 1.0)))
    assert(out(3L) == ((4L, 4L, 2.0)))
    assert(out(4L)._3 == 0.9183)
  }

  test("madOutliers: exact lower-medians, the planted spike flagged, " +
      "means would have been fooled") {
    val s = spark
    import s.implicits._
    // group g: 1,2,3,4,100 -> med 3 (rank ceil(5/2)=3), deviations
    // 2,1,0,1,97 -> MAD 1 -> only 100 is beyond 3*MAD
    val rows = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L),
      ("g", 4L, 4L), ("g", 5L, 100L),
      // group h: constant -> MAD 0, everything equal to med, no flags
      ("h", 6L, 7L), ("h", 7L, 7L))
    val out = CorpusStats.madOutliers(rows.toDF("src", "id", "x"),
        "src", "id", "x")
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(out(1L) == ((3L, 1L, false)))
    assert(out(5L) == ((3L, 1L, true)), "the spike must be flagged")
    assert(out(2L)._3 == false && out(4L)._3 == false)
    assert(out(6L) == ((7L, 0L, false)) && out(7L) == ((7L, 0L, false)))
  }

  test("scriptMix: counts, dominance priority, mixed flag") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "hello world 123"),              // latin + digits
      (2L, "привет gооgle"),                // cyrillic-dominant mix
      (3L, "你好世界"),                      // han only
      (4L, "42 + 17 = 59"),                 // digits only -> none
      (5L, "abcd абвг")                     // 4 vs 4 tie -> latin wins
    ).toDF("doc_id", "text")
    val out = CorpusStats.scriptMix(df, "text")
      .select("doc_id", "n_latin", "n_cyrillic", "n_han", "n_digit",
        "dominant", "mixed")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5), r.getBoolean(6)))).toMap
    assert(out(1L) == ((10L, 0L, 0L, 3L, "latin", false)))
    // "gооgle" has Cyrillic о twice -> latin 4, cyrillic 6+2=8
    assert(out(2L)._1 == 4L && out(2L)._2 == 8L)
    assert(out(2L)._5 == "cyrillic" && out(2L)._6)
    assert(out(3L) == ((0L, 0L, 4L, 0L, "han", false)))
    assert(out(4L)._5 == "none" && !out(4L)._6)
    assert(out(5L)._5 == "latin", "ties resolve by priority order")
  }

  test("vocabCoverage: OOV fraction under a rank-tied vocab cut") {
    val s = spark
    import s.implicits._
    // freqs: a=4, b=3, c=2, d=1, e=1 -> vocab(3) = {a, b, c}
    val df = Seq(
      (1L, "a a b c"), (2L, "a b d"), (3L, "a b c e")
    ).toDF("doc_id", "text")
    val out = CorpusStats.vocabCoverage(df, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((4L, 0L, 0.0)))
    assert(out(2L) == ((3L, 1L, 0.3333)))
    assert(out(3L) == ((4L, 1L, 0.25)))
  }

  test("zipfStats: OLS fit matches the closed-form sums, per group, " +
      "layout-invariant") {
    val s = spark
    import s.implicits._
    // group g: freqs 8,4,2,1 over ranks 1..4; group h: uniform freqs
    val g = Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c") ++
      Seq("d")
    val rows = g.map(("g", _)) ++ Seq("x", "y", "z").map(("h", _))
    val df = rows.zipWithIndex
      .map { case ((src, w), i) => (src, s"$w") }
      .toDF("source", "text")
    val out = CorpusStats.zipfStats(df, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val (xs, ys) = (Seq(1, 2, 3, 4).map(i => math.log(i.toDouble)),
      Seq(8, 4, 2, 1).map(f => math.log(f.toDouble)))
    val (n, sx, sy) = (4.0, xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    assert(out("g")._1 == 4L && out("g")._2 == 15L)
    assert(math.abs(out("g")._3 - math.rint(slope * 1e6) / 1e6) < 1e-9)
    assert(math.abs(out("g")._4 - math.rint(icept * 1e6) / 1e6) < 1e-9)
    // uniform frequencies -> slope 0
    assert(out("h")._1 == 3L && math.abs(out("h")._3) < 1e-9)
    val repart = CorpusStats.zipfStats(df.repartition(7), "source", "text")
      .collect().map(r => (r.getString(0), r.getDouble(3))).toMap
    assert(repart("g") == out("g")._3,
      "fit must not depend on partition layout")
  }
}
