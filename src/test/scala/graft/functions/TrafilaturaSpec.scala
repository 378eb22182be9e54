package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrafilaturaSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val body =
    "this is the main article text and it has all of the stopwords that " +
    "a reader would expect to see in a long paragraph of real prose and " +
    "it keeps going for a while so that the length is well past the " +
    "justext high threshold for a good classification in the end"

  test("pruning rules: sections, main restriction, link density, length, dup") {
    val html =
      "<nav><a href=\"/\">Home</a> <a href=\"/x\">About</a></nav>" +
      "<header><h1>Site banner</h1></header>" +
      s"<article><h2>A heading</h2><p>$body</p>" +
      "<p>tiny</p>" +
      "<p><a href=\"#\">read more and more links</a></p>" +
      "<p>Share this article with friends</p>" +
      "<p>Share this article with friends</p></article>" +
      "<aside><p>related sidebar items</p></aside>" +
      "<footer><p>site footer notice</p></footer>"
    val df = Seq(("d1", html)).toDF("doc_id", "page")
    val cls = Trafilatura.classify(df, "page", "doc_id")
      .select("text", "drop_reason").as[(String, String)].collect().toMap
    assert(cls("Home About") == "unwanted")
    assert(cls("Site banner") == "unwanted")
    assert(cls("related sidebar items") == "unwanted")
    assert(cls("site footer notice") == "unwanted")
    assert(cls("tiny") == "short")
    assert(cls("read more and more links") == "link_density")
    assert(cls("A heading") == "")
    assert(cls(body) == "")
    val kept = Trafilatura.extract(df, "page", "doc_id")
      .orderBy("seq").select("text").as[String].collect().toSeq
    assert(kept == Seq("A heading", body, "Share this article with friends"),
           kept.mkString(" | "))
  }

  test("without article/main, everything non-unwanted competes") {
    val html = s"<div><p>$body</p><p>tiny</p></div>" +
      "<footer><p>site footer notice</p></footer>"
    val df = Seq(("d1", html)).toDF("doc_id", "page")
    val kept = Trafilatura.extract(df, "page", "doc_id")
      .select("text").as[String].collect().toSeq
    assert(kept == Seq(body))
  }

  test("extractLocal agrees with the DataFrame extract path") {
    val pages = Seq(
      s"<article><h2>A heading</h2><p>$body</p><p>tiny</p>" +
        "<p>Share this</p><p>Share this</p></article><footer><p>x y z q</p></footer>",
      s"<div><p>$body</p></div>",
      "<nav><a href=\"/\">only nav here</a></nav>",
      "")
    pages.zipWithIndex.foreach { case (html, i) =>
      val df = Seq((s"d$i", html)).toDF("doc_id", "page")
      val viaDf = Trafilatura.extract(df, "page", "doc_id")
        .orderBy("seq").select("text").as[String].collect().toSeq
      assert(viaDf == Trafilatura.extractLocal(html), s"page $i")
    }
  }

  test("spanize extractor=trafilatura prunes chrome into spans") {
    val html = "<nav><a href=\"/\">Home</a> <a href=\"/y\">More</a></nav>" +
      s"<article><p>$body</p></article><footer><p>footer text here</p></footer>"
    val df = Seq(("d1", html, "text/html")).toDF("doc_id", "chunk_body", "mime")
    val sp = graft.operators.DocPipeline.spanize(df, extractor = "trafilatura")
      .select(explode(col("spans")).as("s"))
      .filter(col("s.kind") === "p")
      .select(col("s.text")).as[String].collect().toSeq
    assert(sp.size == 1 && sp.head.startsWith("this is the main article"), sp)
  }

  test("precision/recall vs justext on a clean article corpus") {
    // ground truth: the two prose paragraphs; both extractors should
    // find exactly them despite nav/footer chrome
    val p2 = body.replace("main article", "second paragraph of")
    val html =
      "<nav><a href=\"/\">Home</a> <a href=\"/y\">Archive pages</a></nav>" +
      s"<article><p>$body</p><p>$p2</p></article>" +
      "<footer><p><a href=\"#\">impressum</a> <a href=\"#\">contact</a></p></footer>"
    val df = Seq(("d1", html)).toDF("doc_id", "page")
    val truth = Set(body, p2)
    val traf = Trafilatura.extract(df, "page", "doc_id")
      .select("text").as[String].collect().toSet
    val just = Boilerplate.extract(df, "page", "doc_id")
      .select(explode(col("paragraphs")).as("t"))
      .as[String].collect().toSet
    def pr(got: Set[String]) = (
      if (got.isEmpty) 0.0 else got.count(truth).toDouble / got.size,
      truth.count(got).toDouble / truth.size)
    assert(pr(traf) == ((1.0, 1.0)), s"trafilatura: ${pr(traf)} got $traf")
    assert(pr(just) == ((1.0, 1.0)), s"justext: ${pr(just)} got $just")
  }
}
