package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class EmtsvSpec extends AnyFunSuite {

  test("tokenize: sentence split, punct isolation, <=3 punct-run cap") {
    val sents = Emtsv.tokenizeSentences(
      "Hello world. What?! This costs 5 forints, really!!!!!!!! End here")
    assert(sents.map(_._1) == Seq(
      "Hello world.", "What?!",
      "This costs 5 forints, really!!!!!!!!", "End here"))
    assert(sents(0)._2 == Seq("Hello", "world", "."))
    assert(sents(1)._2 == Seq("What", "?", "!"))
    // the 8-bang run is capped at 3 (emtsv.py:149–155); the comma resets
    // nothing — it counts into the punct run bookkeeping per token
    assert(sents(2)._2 == Seq("This", "costs", "5", "forints", ",",
                              "really", "!", "!", "!"))
    assert(sents(3)._2 == Seq("End", "here"))
  }

  test("accented (Hungarian) words stay whole tokens") {
    val sents = Emtsv.tokenizeSentences("Szép ház volt. Őszi út, hűvös.")
    assert(sents.map(_._2) == Seq(
      Seq("Szép", "ház", "volt", "."),
      Seq("Őszi", "út", ",", "hűvös", ".")))
  }

  test("punct run counting spans tokens exactly like the reference") {
    // , ; ; ; ; — the comma starts the run; only 3 total survive before
    // a word resets the counter (semicolons: punct but not sentence-
    // ending, so the run stays inside one sentence)
    val sents = Emtsv.tokenizeSentences("a ,;;;; b")
    assert(sents.length == 1)
    assert(sents(0)._2 == Seq("a", ",", ";", ";", "b"))
  }

  test("analyzeDoc builds a Unit tree that round-trips through render/parse") {
    val tree = Emtsv.analyzeDoc("https://x/1",
      Seq("First par. Second sentence!", "Next 42 par"))
    assert(tree.comment == "# newdoc id = https://x/1")
    assert(tree.paragraphs.map(_.comment) == Seq(
      "# newdoc id = https://x/1-p1".replace("newdoc", "newpar"),
      "# newdoc id = https://x/1-p2".replace("newdoc", "newpar")))
    assert(tree.paragraphs(0).sentences.map(_.comment) == Seq(
      "# text = First par.", "# text = Second sentence!"))
    // stand-in analysis columns: [form, lemma, xpostag]
    val t42 = tree.paragraphs(1).sentences(0).tokens(1)
    assert(t42 == Seq("42", "42", "[/Num][Nom]"))
    val first = tree.paragraphs(0).sentences(0).tokens(0)
    assert(first == Seq("First", "first", "[/N][Nom]"))
    val dot = tree.paragraphs(0).sentences(0).tokens(2)
    assert(dot == Seq(".", ".", "[Punct]"))
    // byte-compatible with the tsv parser
    val (_, parsed) = TsvUnits.parseDocs(
      TsvUnits.render(tree) + "\n", useHeaders = false)
    assert(parsed == Seq(tree))
  }

  test("empty paragraphs are dropped; distributed view is 1-based") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val tree = Emtsv.analyzeDoc("d", Seq("", "only one here"))
    assert(tree.paragraphs.length == 1)
    assert(tree.paragraphs.head.comment.endsWith("-p2"))
    val rows = Emtsv.analyzeTokens(
        Seq(("7", "Two words. And more!")).toDF("doc_id", "text"))
      .collect().map(r => (r.getInt(2), r.getInt(3), r.getString(4)))
    assert(rows.toSeq == Seq(
      (1, 1, "Two"), (1, 2, "words"), (1, 3, "."),
      (2, 1, "And"), (2, 2, "more"), (2, 3, "!")))
  }
}
