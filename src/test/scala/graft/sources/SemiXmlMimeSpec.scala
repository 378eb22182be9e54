package graft.sources

import graft.TestSpark
import graft.functions.Mimes
import org.scalatest.funsuite.AnyFunSuite

/** S5 legacy semi-XML corpus format (cc_corpus/corpus.py:148–279) and
  * F18/F19 MIME sniffing / content normalization (cc_corpus/mime.py).
  */
class SemiXmlMimeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private val corpus =
    """<doc id="d1" url="https://a.example.com/x" domain="a.example.com">
      |<meta>
      |<request>
      |GET /x HTTP/1.1
      |Host: a.example.com
      |</request>
      |<response>
      |HTTP/1.1 200 OK
      |</response>
      |</meta>
      |<p>
      |first paragraph line one
      |line two
      |</p>
      |<p>
      |second paragraph
      |</p>
      |</doc>
      |<doc id="d2">
      |<p>
      |only one para
      |</p>
      |</doc>""".stripMargin

  test("semi-XML parser: attrs, multi-line meta, multi-line paragraphs") {
    val docs = corpus.split("</doc>").map(_.trim).filter(_.nonEmpty)
      .map(CorpusSource.parseSemiXmlDoc)
    assert(docs.length == 2)
    val d1 = docs(0)
    assert(d1.attrs == Map("id" -> "d1", "url" -> "https://a.example.com/x",
                           "domain" -> "a.example.com"))
    assert(d1.meta("request") == "GET /x HTTP/1.1\nHost: a.example.com")
    assert(d1.meta("response") == "HTTP/1.1 200 OK")
    assert(d1.paragraphs ==
      Seq("first paragraph line one\nline two", "second paragraph"))
    assert(docs(1).attrs == Map("id" -> "d2"))
    assert(docs(1).meta.isEmpty)
  }

  test("semi-XML reader: distributed read to the span table") {
    val dir = java.nio.file.Files.createTempDirectory("semixml")
    java.nio.file.Files.writeString(dir.resolve("part1.txt"), corpus)
    val df = CorpusSource.readSemiXml(spark, dir.toString)
      .orderBy("doc_id").collect()
    assert(df.length == 2)
    assert(df(0).getAs[String]("doc_id") == "d1")
    val spans = df(0).getSeq[org.apache.spark.sql.Row](3)
    assert(spans.map(_.getString(1)) ==
      Seq("first paragraph line one\nline two", "second paragraph"))
  }

  test("semi-XML round-trip: format then parse is identity") {
    val attrs = Map("id" -> "r1", "url" -> "https://r.example.com")
    val meta  = Map("request" -> "GET / HTTP/1.1", "index" -> "f0:12")
    val paras = Seq("alpha beta", "gamma\ndelta")
    val rendered = CorpusSource.formatSemiXmlDoc(attrs, meta, paras)
    val parsed = CorpusSource.parseSemiXmlDoc(
      rendered.stripSuffix("</doc>"))
    assert(parsed.attrs == attrs)
    assert(parsed.meta == meta)
    assert(parsed.paragraphs == paras)
  }

  test("mime sniffing: magic bytes, markup, printable heuristic") {
    def b(s: String) = s.getBytes("ISO-8859-1")
    assert(Mimes.sniff(b("%PDF-1.7 blah")) == "application/pdf")
    assert(Mimes.sniff(Array(0x89.toByte, 'P', 'N', 'G', 13, 10)) == "image/png")
    assert(Mimes.sniff(Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)) == "image/jpeg")
    assert(Mimes.sniff(b("GIF89a....")) == "image/gif")
    assert(Mimes.sniff(Array(0x1f.toByte, 0x8b.toByte, 8)) == "application/gzip")
    assert(Mimes.sniff(b("  <!DOCTYPE html><html>...")) == "text/html")
    assert(Mimes.sniff(b("<div>fragment</div> with a <body> tag")) == "text/html")
    assert(Mimes.sniff(b("<?xml version=\"1.0\"?><rss><channel/></rss>")) == "application/rss+xml")
    assert(Mimes.sniff(b("<?xml version=\"1.0\"?><feed/>")) == "application/atom+xml")
    assert(Mimes.sniff(b("plain old text, nothing else")) == "text/plain")
    assert(Mimes.sniff(Array.fill(100)(0.toByte)) == "application/octet-stream")
    assert(Mimes.sniff(b("RIFF1234WAVEfmt ")) == "audio/wav")
    assert(Mimes.sniff(b("0123ftypisom....")) == "video/mp4")
  }

  test("mime simplify + content normalization") {
    assert(Mimes.simplify("text/plain") == "txt")
    assert(Mimes.simplify("text/html") == "html")
    assert(Mimes.simplify("application/xhtml+xml") == "html")
    assert(Mimes.simplify("application/pdf") == null)
    def n(s: String) = Mimes.normalizeContent(s.getBytes("UTF-8"))
    assert(n("just words here") == "<html><body>just words here</body></html>")
    assert(n("<html lang=\"en\"><p>x</p></html>")
      .startsWith("<html lang=\"en\"><body>"))
    val full = "<html><body><p>x</p></body></html>"
    assert(n(full) == full)
    assert(Mimes.normalizeContent(Array(0x89.toByte, 'P', 'N', 'G')) == null)
  }

  test("content decode honors Content-Type charset, falls back losslessly") {
    val latin1 = "café naïve résumé"
    val bytes  = latin1.getBytes("ISO-8859-1")
    // no header: strict UTF-8 probe fails on the 0xE9 bytes -> Latin-1
    // fallback reproduces the text (no U+FFFD corruption)
    assert(Mimes.decodeText(bytes) == latin1)
    // explicit header charset wins
    assert(Mimes.decodeText(bytes, "text/html; charset=ISO-8859-1") == latin1)
    assert(Mimes.decodeText(latin1.getBytes("UTF-8"),
                            "text/html; charset=utf-8") == latin1)
    // unknown charset name degrades to the probe, not a crash
    assert(Mimes.decodeText(bytes, "text/html; charset=bogus-9") == latin1)
    // valid UTF-8 without header decodes as UTF-8
    assert(Mimes.decodeText(latin1.getBytes("UTF-8")) == latin1)
    // end-to-end: normalization wraps without corrupting accents
    assert(Mimes.normalizeContent(bytes, "text/plain; charset=iso-8859-1")
      == s"<html><body>$latin1</body></html>")
  }
}
