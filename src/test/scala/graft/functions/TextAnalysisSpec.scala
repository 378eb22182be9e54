package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {

  test("simhash: identical texts collide, similar texts are close") {
    val a = TextAnalysis.simhash64("the quick brown fox jumps over dogs")
    val b = TextAnalysis.simhash64("the quick brown fox jumps over dogs")
    val c = TextAnalysis.simhash64("the quick brown fox jumps over cats")
    val d = TextAnalysis.simhash64("entirely unrelated words here xyzzy")
    assert(a == b)
    assert(TextAnalysis.hamming64(a, c) < TextAnalysis.hamming64(a, d))
  }

  test("min shingle hash: shared shingles can share fingerprints") {
    val a = TextAnalysis.minShingleHash("a b c d e f g h")
    val b = TextAnalysis.minShingleHash("a b c d e f g h")
    assert(a == b)
    // shorter than k words falls back to whole-text hash
    val s = TextAnalysis.minShingleHash("one two")
    assert(s == MinHashF.fnv64("one two"))
  }

  test("wordpiece: greedy longest match with ## continuations and [UNK]") {
    val vocab = Set("un", "##aff", "##able", "##ab", "hello", "##lo", "hel")
    assert(TextAnalysis.wordpiece("unaffable", vocab) ==
      Seq("un", "##aff", "##able"))
    assert(TextAnalysis.wordpiece("hello", vocab) == Seq("hello"))
    assert(TextAnalysis.wordpiece("unknownword", vocab) == Seq("[UNK]"))
    assert(TextAnalysis.wordpiece("hello unaffable", vocab) ==
      Seq("hello", "un", "##aff", "##able"))
    // greedy: 'hello' wins over 'hel'+'##lo'
    assert(TextAnalysis.wordpiece("", vocab) == Seq.empty)
  }

  test("langid markers count literally (non-overlapping replace)") {
    // column form parity is covered in CrawlParitySpec; here the
    // degenerate inputs
    assert(TextAnalysis.LangMarkers.map(_._1) == Seq("en", "de", "fr", "es"))
  }
}
