package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TsvUnitsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sample =
    "form\tlemma\txpostag\n" +
    "# newdoc id = d1\n" +
    "# newpar id = d1p1\n" +
    "# text = a b\n" +
    "a\tA\t[/N]\n" +
    "b\tB\t[/V]\n" +
    "\n" +
    "# text = c\n" +
    "c\tC\t[/N]\n" +
    "# newpar id = d1p2\n" +
    "# text = d\n" +
    "d\tD\t[/Adj]\n" +
    "# newdoc id = d2\n" +
    "# newpar id = d2p1\n" +
    "# text = e\n" +
    "e\tE\t[/N]\n"

  test("parse: header + 3-level unit tree with the reference's shape") {
    val (header, docs) = TsvUnits.parseDocs(sample)
    assert(header == Seq("form", "lemma", "xpostag"))
    assert(docs.map(_.comment) ==
      Seq("# newdoc id = d1", "# newdoc id = d2"))
    val d1 = docs.head
    assert(d1.paragraphs.map(_.comment) ==
      Seq("# newpar id = d1p1", "# newpar id = d1p2"))
    assert(d1.paragraphs.head.sentences.map(_.comment) ==
      Seq("# text = a b", "# text = c"))
    assert(d1.paragraphs.head.sentences.head.tokens ==
      Seq(Seq("a", "A", "[/N]"), Seq("b", "B", "[/V]")))
    // token count accumulates across the whole tree (tsv.py tokens())
    assert(d1.paragraphs.flatMap(_.sentences).map(_.tokens.size).sum == 4)
  }

  test("render round-trips the reference __str__ serialization") {
    val (_, docs) = TsvUnits.parseDocs(sample)
    // reference prints units joined by '\n', sentences with trailing '\n';
    // re-parsing a rendered doc yields the identical tree
    docs.foreach { d =>
      val (_, reparsed) = TsvUnits.parseDocs(TsvUnits.render(d), useHeaders = false)
      assert(reparsed == Seq(d), TsvUnits.render(d))
    }
  }

  test("token row before any '# text' comment is a format error") {
    val bad = "h\n# newdoc id = x\n# newpar id = xp\nrogue\ttoken\n"
    val e = intercept[IllegalStateException](TsvUnits.parseDocs(bad))
    assert(e.getMessage.contains("without \"text\" comment"))
  }

  test("readTsv + tokensView: distributed parse matches the local parse") {
    val dir = java.nio.file.Files.createTempDirectory("tsv-src")
    java.nio.file.Files.writeString(dir.resolve("part1.tsv"), sample)
    val docs = TsvUnits.readTsv(spark, dir.toString)
    assert(docs.count() == 2)
    assert(docs.select("doc_id").as[String].collect().toSet == Set("d1", "d2"))
    val toks = TsvUnits.tokensView(docs)
    assert(toks.count() == 5)
    val first = toks.filter($"doc_id" === "d1" && $"par_idx" === 0 &&
                            $"sent_idx" === 0 && $"tok_idx" === 1)
      .select("fields").as[Seq[String]].head()
    assert(first == Seq("b", "B", "[/V]"))
  }

  test("trainingLines: bert and lm layouts, text mode") {
    val (_, docs) = TsvUnits.parseDocs(sample)
    val d1 = docs.head
    // bert: one sentence per line + blank line after the document
    assert(TsvUnits.trainingLines(d1, Map.empty, "text", "bert") ==
      Seq("a b", "c", "d", ""))
    // lm: blank/<newdoc>/blank preamble + one PARAGRAPH per line
    assert(TsvUnits.trainingLines(d1, Map.empty, "text", "lm") ==
      Seq("", "<newdoc>", "", "a b c", "d"))
    // lowercase + field mode (lemma column)
    val fields = Map("form" -> 0, "lemma" -> 1, "xpostag" -> 2)
    assert(TsvUnits.trainingLines(d1, fields, "lemma", "bert",
                                  lowerCase = true) ==
      Seq("a b", "c", "d", ""))
  }

  test("trainingLines: glf extraction (lemma + tags, Ord/Adj dot strip)") {
    val doc = TsvUnits.TsvDocument("# newdoc id = g", Seq(
      TsvUnits.TsvParagraph("# newpar id = gp", Seq(
        TsvUnits.TsvSentence("# text = kutyák 3.", Seq(
          Seq("kutyák", "kutya", "[/N][Pl][Nom]"),
          Seq("3.", "3.", "[/Adj][_Ord/Adj]")))))))
    val fields = Map("form" -> 0, "lemma" -> 1, "xpostag" -> 2)
    val got = TsvUnits.trainingLines(doc, fields, "glf", "bert")
    // [Nom] dropped; the last leading slash/punct tag is replaced by the
    // lemma; [_Ord/Adj] after the slash block strips the lemma's dot
    assert(got == Seq("kutya [Pl] 3 [_Ord/Adj]", ""), got)
    // a token with no leading / tag is a format error (reference raises)
    val bad = doc.copy(paragraphs = Seq(TsvUnits.TsvParagraph("# newpar id = x",
      Seq(TsvUnits.TsvSentence("# text = x",
        Seq(Seq("x", "x", "[Pl]")))))))
    intercept[IllegalArgumentException](
      TsvUnits.trainingLines(bad, fields, "glf", "bert"))
  }

  test("toTrainingLines: DF form emits per-line rows in document order") {
    val dir = java.nio.file.Files.createTempDirectory("tsv-bert")
    java.nio.file.Files.writeString(dir.resolve("f.tsv"), sample)
    val docs = TsvUnits.readTsv(spark, dir.toString)
    val got = TsvUnits.toTrainingLines(docs, Map.empty)
      .orderBy("doc_idx", "line_idx")
      .select("line").as[String].collect().toSeq
    assert(got == Seq("a b", "c", "d", "", "e", ""))
    // wordpiece composition: vocab splits 'a'/'b' whole, unknown -> [UNK]
    val wp = TsvUnits.toTrainingLines(docs, Map.empty,
      vocab = Some(Set("a", "b", "c", "##b")))
      .orderBy("doc_idx", "line_idx")
      .select("line").as[String].collect().toSeq
    assert(wp.head == "a b")
    assert(wp(2) == "[UNK]") // 'd' not in vocab
  }

  test("fix_corpus rules: invalid-line expansion + wsafter derivation") {
    val doc = TsvUnits.TsvDocument("# newdoc id = f", Seq(
      TsvUnits.TsvParagraph("# newpar id = fp", Seq(
        TsvUnits.TsvSentence("# text = ab c",
          Seq(Seq("ab"), Seq("c", "C", "[/N]", "x"))),
        TsvUnits.TsvSentence("# text = de",
          Seq(Seq("de", "DE", "[/V]", "y")))))))
    val (fixed, n) = TsvUnits.fixInvalidLines(doc, numFields = 4)
    assert(n == 1)
    assert(fixed.paragraphs.head.sentences.head.tokens.head ==
      Seq("ab", "[]", "ab", "[/N][Nom]"))
    // wrong-but-not-1 field count is a hard error (reference raises)
    intercept[IllegalArgumentException](
      TsvUnits.fixInvalidLines(doc, numFields = 3))
    val ws = TsvUnits.addWsafter(fixed)
    val s1 = ws.paragraphs.head.sentences.head.tokens
    val s2 = ws.paragraphs.head.sentences(1).tokens
    // 'ab' followed by a space in the raw text; 'c' ends sentence 1 of 2
    assert(s1.head(1) == "\" \"" && s1(1)(1) == "\"\\n\"")
    // 'de' ends the paragraph's last sentence
    assert(s2.head(1) == "\"\\n\\n\"")
    // inserted at position 1, rest of the fields preserved
    assert(s1(1) == Seq("c", "\"\\n\"", "C", "[/N]", "x"))
  }

  test("spmToBertVocab: tag sets, unused tokens, piece mapping, order") {
    val spm = Seq("<unk>\t0", "<s>\t0", "</s>\t0",
                  "▁the\t-1.5", "▁a\t-2.0", "ing\t-3.1", "▁\t-9")
    val bert = TsvUnits.spmToBertVocab(spm, "bert", unusedTokens = 2)
    assert(bert == Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
      "[unused1]", "[unused2]",
      "the", "a", "##ing")) // specials removed; bare '▁' dropped
    val lm = TsvUnits.spmToBertVocab(spm, "lm")
    assert(lm.take(2) == Seq("<newdoc>", "<unk>"))
    assert(!lm.contains("[unused1]")) // lm default: no unused tokens
    // bert default is 1000 unused tokens
    assert(TsvUnits.spmToBertVocab(Seq.empty).length == 5 + 1000)
  }

  test("cleanXpostagCol mirrors the emMorph cleanup rules") {
    // cases exercise each regex of tsv.py:142–154 in order
    val cases = Seq(
      "[/N][Acc][]" -> "[/N][Acc]",   // [] removal
      "[1][Sg]"     -> "[1Sg]",       // split Sg, variant 1
      "[2][S][g]"   -> "[2Sg]",       // split Sg, variant 2
      "[3][Pl]"     -> "[3Pl]",       // split Pl, variant 1
      "[1][P][l]"   -> "[1Pl]",       // split Pl, variant 2
      "[N][Nom]"    -> "[/N][Nom]",   // leading bare [N] -> [/N]
      "[[[Adj]"     -> "[Adj]",       // doubled brackets collapse
      "[V][[Prs]"   -> "[/V][Prs]")   // slash then double, chained
    val got = cases.map(_._1).toDF("raw")
      .select(TsvUnits.cleanXpostagCol(col("raw")).as("c"))
      .as[String].collect().toSeq
    assert(got == cases.map(_._2), got.mkString(", "))
  }
}
