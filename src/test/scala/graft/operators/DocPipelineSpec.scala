package graft.operators

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DocPipelineSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def spansOf(df: org.apache.spark.sql.DataFrame): Seq[Seq[(String, String, String, Int)]] =
    df.select("spans").collect().toSeq.map(
      _.getSeq[Row](0).map(s =>
        (s.getString(0), s.getString(1), s.getString(2), s.getInt(3))))

  test("spanize: html -> paragraph + media spans with contiguous offsets") {
    val html = "<html><body><p>First paragraph text here</p>" +
      "<img src=\"http://x/img1.png\"><p>Second paragraph body text</p>" +
      "<div>Third block of sufficient length</div></body></html>"
    val df = Seq(("d1", html, "text/html")).toDF("doc_id", "chunk_body", "mime")
    val out = spansOf(DocPipeline.spanize(df))
    assert(out.size == 1)
    val spans = out.head
    assert(spans.map(_._1) == Seq("p", "p", "p", "media"))
    assert(spans.head._2 == "First paragraph text here")
    assert(spans.last._3 == "http://x/img1.png")
    assert(spans.map(_._4) == Seq(0, 1, 2, 3))
  }

  test("convertChunks dispatches atom/rss/bib") {
    val atom = "<feed><content type=\"html\">chunk one body text</content>" +
      "<content>chunk two body text</content></feed>"
    val df = Seq(
      ("a", atom, "application/atom+xml"),
      ("r", "<rss><description>desc one body</description></rss>",
       "application/rss+xml"),
      ("b", "@article{x}\n\n@book{y}", "text/x-bibtex"),
      ("h", "<p>plain html doc</p>", "text/html")
    ).toDF("doc_id", "chunk_body", "mime")
    val got = df.select($"doc_id",
      size(DocPipeline.convertChunks($"chunk_body", $"mime")).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("a" -> 2, "r" -> 1, "b" -> 2, "h" -> 1))
  }

  test("escapeParagraph mirrors saxutils.escape + whitespace collapse") {
    val got = Seq("a < b & c\t\td  \n e>")
      .toDF("p").select(DocPipeline.escapeParagraph($"p")).as[String].head()
    assert(got == "a &lt; b &amp; c d e&gt;")
  }

  test("filterTokens: 3-punct dropped, word... kept, whitelist kept") {
    val got = Seq("ok word... !!! (!) abc!!!def normal?!")
      .toDF("p").select(DocPipeline.filterTokens($"p")).as[String].head()
    // "!!!" has 3 consecutive punct -> dropped; "(!)" whitelisted;
    // "abc!!!def" has 3 punct inside -> dropped; "normal?!" only 2 -> kept
    assert(got == "ok word... (!) normal?!")
  }

  test("cookie paragraph filter drops matching spans") {
    val html = "<p>This site uses cookies for tracking</p>" +
      "<p>Real content paragraph here</p>"
    val df  = Seq(("d", html, "text/html")).toDF("doc_id", "chunk_body", "mime")
    val out = spansOf(DocPipeline.spanize(df)).head
    assert(out.map(_._2) == Seq("Real content paragraph here"))
  }

  test("sameDocDedup keeps first occurrence of identical spans") {
    val spans = Seq(
      ("p", "dup text", "", 0), ("p", "other text", "", 1),
      ("media", "", "m1", 2), ("p", "dup text", "", 3),
      ("media", "", "m1", 4), ("p", "third text", "", 5))
    val df = Seq(Tuple1(spans)).toDF("raw")
      .select($"raw".cast(
        "array<struct<kind:string,text:string,media_ref:string,offset:int>>")
        .as("spans"))
    val got = df.select(DocPipeline.sameDocDedup($"spans").as("spans"))
    assert(spansOf(got).head == Seq(
      ("p", "dup text", "", 0), ("p", "other text", "", 1),
      ("media", "", "m1", 2), ("p", "third text", "", 3)))
  }

  test("wc words/chars match corpus.py semantics") {
    val spans = Seq(("p", "one two three", "", 0), ("media", "", "m", 1),
                    ("p", "four five", "", 2))
    val df = Seq(Tuple1(spans)).toDF("raw")
      .select($"raw".cast(
        "array<struct<kind:string,text:string,media_ref:string,offset:int>>")
        .as("spans"))
    val r = df.select(DocPipeline.wcWords($"spans").as("w"),
                      DocPipeline.wcChars($"spans").as("c")).head()
    assert(r.getLong(0) == 5)
    assert(r.getLong(1) == 13 + 9 + 1) // text lens + 1 newline
  }

  test("fetchJoin aligns entries with the warc store") {
    val entries = Seq(("w1", 0L, "u1"), ("w1", 100L, "u2"), ("w2", 0L, "u3"))
      .toDF("warc", "offset", "url")
    val store = Seq(("w1", 0L, "body1"), ("w1", 100L, "body2"))
      .toDF("warc", "offset", "body")
    val got = DocPipeline.fetchJoin(entries, store)
      .select("url", "body").as[(String, String)].collect().toSet
    assert(got == Set(("u1", "body1"), ("u2", "body2")))
  }

  test("validateSpans: each invariant violation is caught at its position") {
    val s = spark
    import s.implicits._
    import DocPipelineSpec.Sp
    val docs = Seq(
      (1L, Seq(Sp("text", "a", "", 0), Sp("image", "", "m:1", 5))),
      (2L, Seq(Sp("text", "a", "", 0), Sp("text", "b", "", 0))),  // dup off
      (3L, Seq(Sp("glyph", "a", "", 0))),                          // kind
      (4L, Seq(Sp("text", "", "", 0))),                            // no text
      (5L, Seq(Sp("audio", "", "", 0))),                           // no ref
      (6L, Seq(Sp("text", "a", "", 9), Sp("text", "b", "", 3),     // two bad
               Sp("vid", "c", "", 20)))
    ).toDF("doc_id", "spans")
    val got = DocPipeline.validateSpans(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
         r.getBoolean(3))).toMap
    assert(got(1L) == (0L, None, true))
    assert(got(2L) == (1L, Some(1L), false))
    assert(got(3L) == (1L, Some(0L), false))
    assert(got(4L) == (1L, Some(0L), false))
    assert(got(5L) == (1L, Some(0L), false))
    assert(got(6L) == (2L, Some(1L), false))
  }

  test("spanStats: counts, chars, distinct refs and fraction per doc") {
    val s = spark
    import s.implicits._
    import DocPipelineSpec.Sp
    val docs = Seq(
      (1L, Seq(Sp("text", "hello", "", 0), Sp("image", "", "m:1", 5),
        Sp("text", "worlds", "", 6), Sp("image", "", "m:1", 12))),
      (2L, Seq(Sp("text", "abc", "", 0))),
      (3L, Seq(Sp("video", "", "v:9", 0))),
      (4L, Seq.empty[Sp])).toDF("doc_id", "spans")
    val out = DocPipeline.spanStats(docs)
      .select("doc_id", "n_spans", "n_text", "n_media", "text_chars",
        "n_media_refs", "media_frac")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6)))).toMap
    // doc 1: dup media_ref counts once; 5+6 text chars; 2/4 media
    assert(out(1L) == ((4L, 2L, 2L, 11L, 1L, 0.5)))
    assert(out(2L) == ((1L, 1L, 0L, 3L, 0L, 0.0)))
    assert(out(3L) == ((1L, 0L, 1L, 0L, 1L, 1.0)))
    assert(out(4L) == ((0L, 0L, 0L, 0L, 0L, 0.0)))
  }
}

object DocPipelineSpec {
  case class Sp(kind: String, text: String, media_ref: String, offset: Int)
}
