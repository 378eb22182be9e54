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
