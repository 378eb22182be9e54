package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the JusText-core boilerplate classifier
  * (cc_corpus/boilerplate.py:34–45 semantics; Pomikálek 2011 defaults).
  */
class BoilerplateSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private val goodText =
    ("the quick brown fox jumps over a lazy dog and then it runs to the " +
      "forest where all of the animals were waiting for it to arrive " +
      "and they all had a party in the clearing by the river and the " +
      "story of that day was that they were all very happy with it") // > 200 chars, stopword-rich

  test("parser: block tags split, inline tags don't, script skipped") {
    val html =
      """<html><head><title>T</title><script>var x = "<p>hi</p>";</script>
        |</head><body><p>one <b>two</b> three</p><div>four</div></body>""".stripMargin
    val blocks = Boilerplate.parseBlocks(html)
    assert(blocks.map(_.text) == Vector("T", "one two three", "four"))
    assert(blocks.forall(_.link_chars == 0))
  }

  test("parser: link chars counted, entities decoded, whitespace collapsed") {
    val html = """<p><a href="/">Home   page</a>  and &amp; more</p>"""
    val b = Boilerplate.parseBlocks(html)
    assert(b.size == 1)
    assert(b.head.text == "Home page and & more")
    assert(b.head.link_chars == "Home page".length)
  }

  test("classifier: link-heavy nav bad, long stopword-rich para good") {
    val html =
      s"""<div><a href="/">Home</a> <a href="/x">About us and contact</a></div>
         |<p>$goodText</p>
         |<p>© 2024 example corp</p>""".stripMargin
    val kept = Boilerplate.extractLocal(html)
    assert(kept == Seq(goodText))
  }

  test("revision: short between goods promoted, isolated short dropped") {
    val short = "a short heading here"
    val html = s"<p>$goodText</p><p>$short</p><p>$goodText</p>"
    assert(Boilerplate.extractLocal(html) ==
      Seq(goodText, short, goodText))
    val htmlIso = s"<p>$short</p><p>only numbers 123 456 789 xyz qqq</p>"
    assert(Boilerplate.extractLocal(htmlIso).isEmpty)
  }

  test("revision: neargood next to good promoted, isolated neargood dropped") {
    // 70..200 chars, stopword density >= 0.32 -> neargood
    val ng = "the cat and the dog are in a house by the lake and they sleep in it all day"
    assert(Boilerplate.extractLocal(s"<p>$goodText</p><p>$ng</p>") ==
      Seq(goodText, ng))
    assert(Boilerplate.extractLocal(s"<p>$ng</p>").isEmpty)
  }

  test("DF classify path agrees with the local path") {
    import spark.implicits._
    val htmls = Seq(
      s"""<div><a href="/">Home</a> <a href="/x">About us here</a></div>
         |<p>$goodText</p><p>short one</p><p>$goodText</p>
         |<p>© footer</p>""".stripMargin,
      s"<p>nothing special 123</p><p>$goodText</p>",
      "<p></p>",
      s"<ul><li>the first item of a list</li><li>x</li></ul><p>$goodText</p>"
    ).zipWithIndex.map { case (h, i) => (i.toLong, h) }
    val df = htmls.toDF("doc_id", "html")
    val dfOut = Boilerplate.classify(df, "html", "doc_id")
      .select("doc_id", "p_idx", "final_class")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSet
    val local = htmls.flatMap { case (id, h) =>
      val blocks = Boilerplate.parseBlocks(h)
      val fin = Boilerplate.reviseLocal(
        blocks.map(b => Boilerplate.contextFreeClassLocal(b.text, b.link_chars)))
      fin.zipWithIndex.map { case (c, i) => (id, i, c) }
    }.toSet
    assert(dfOut == local)
  }

  test("headings: short heading before good content is kept " +
       "(justext good-headings pass)") {
    val html = s"<h2>a section heading</h2><p>$goodText</p>"
    val blocks = Boilerplate.parseBlocks(html)
    assert(blocks.map(_.heading) == Vector(true, false))
    // phase 2: short heading with a good block 0 chars later -> neargood;
    // phase 4: lead(p3) = good -> good
    assert(Boilerplate.extractLocal(html) ==
      Seq("a section heading", goodText))
    // same heading with no good content stays out
    assert(Boilerplate.extractLocal(
      "<h2>a section heading</h2><p>x 1 2</p>").isEmpty)
    // heading far (> 200 chars of bad blocks) from the good block: the
    // distance budget is exceeded -> not promoted
    val far = "z9 " * 100 // bad filler, 300 chars
    assert(Boilerplate.extractLocal(
      s"<h2>a section heading</h2><p>$far</p><p>$goodText</p>") ==
      Seq(goodText))
  }

  test("headings: DF classify path agrees with the literal local loops " +
       "on heading-bearing docs") {
    import spark.implicits._
    val htmls = Seq(
      s"<h2>a section heading</h2><p>$goodText</p>",
      s"<h2>a section heading</h2><p>x 1 2</p>",
      s"<h2>heading</h2><p>${"z9 " * 100}</p><p>$goodText</p>",
      s"<p>$goodText</p><h3>trailing heading</h3>",
      s"<h1>one</h1><h2>two</h2><p>$goodText</p>"
    ).zipWithIndex.map { case (h, i) => (i.toLong, h) }
    val df = htmls.toDF("doc_id", "html")
    val dfOut = Boilerplate.classify(df, "html", "doc_id")
      .select("doc_id", "p_idx", "final_class")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSet
    val local = htmls.flatMap { case (id, h) =>
      val blocks = Boilerplate.parseBlocks(h)
      val fin = Boilerplate.reviseLocal(
        blocks.map(b => Boilerplate.contextFreeClassLocal(b.text, b.link_chars)),
        blocks.map(_.heading), blocks.map(_.text.length))
      fin.zipWithIndex.map { case (c, i) => (id, i, c) }
    }.toSet
    assert(dfOut == local)
  }

  test("spanize justext mode drops nav/footer, keeps content spans") {
    import spark.implicits._
    val df = Seq((1L,
      s"""<div><a href="/">Home</a> <a href="/x">About and more of it</a></div>
         |<p>$goodText</p><p>© 2024</p>""".stripMargin,
      "text/html")).toDF("doc_id", "chunk_body", "mime")
    val sp = graft.operators.DocPipeline.spanize(df, justext = true)
      .select("spans").head().getSeq[org.apache.spark.sql.Row](0)
    val pTexts = sp.filter(_.getString(0) == "p").map(_.getString(1))
    assert(pTexts.size == 1)
    assert(pTexts.head.startsWith("the quick brown fox"))
  }
}
