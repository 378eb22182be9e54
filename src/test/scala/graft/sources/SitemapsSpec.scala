package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SitemapsSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  test("parse: urlset entries with entities and optional lastmod") {
    val s = spark
    import s.implicits._
    val xml = "<urlset>" +
      "<url><loc>https://a/p?x=1&amp;y=&lt;2&gt;</loc>" +
      "<lastmod>2024-01-02</lastmod></url>" +
      "<url><loc>https://a/q</loc></url>" + // no lastmod
      "<url><lastmod>2024-03-04</lastmod></url>" + // no loc: dropped
      "</urlset>"
    val out = Sitemaps.parse(Seq((1L, xml)).toDF("sitemap_id", "xml"))
      .collect().map(r => (r.getString(2), r.getString(1), r.getString(3)))
      .toSet
    assert(out == Set(
      ("https://a/p?x=1&y=<2>", "url", "2024-01-02"),
      ("https://a/q", "url", "")))
  }

  test("parse: sitemapindex yields child-sitemap pointers") {
    val s = spark
    import s.implicits._
    val xml = "<sitemapindex>" +
      "<sitemap><loc>https://a/s1.xml</loc></sitemap>" +
      "<sitemap><loc>https://a/s2.xml</loc>" +
      "<lastmod>2024-05-06</lastmod></sitemap>" +
      "</sitemapindex>"
    val out = Sitemaps.parse(Seq((7L, xml)).toDF("sitemap_id", "xml"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(out == Set(
      (7L, "sitemap", "https://a/s1.xml", ""),
      (7L, "sitemap", "https://a/s2.xml", "2024-05-06")))
  }

  test("parse: real-world shape — xmlns attributes and pretty-printing") {
    val s = spark
    import s.implicits._
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc>https://example.com/a</loc>
        |    <lastmod>2024-07-01</lastmod>
        |  </url>
        |  <url>
        |    <loc>
        |      https://example.com/b
        |    </loc>
        |  </url>
        |</urlset>""".stripMargin
    val out = Sitemaps.parse(Seq((1L, xml)).toDF("sitemap_id", "xml"))
      .collect().map(r => (r.getString(2), r.getString(3))).toSet
    assert(out == Set(("https://example.com/a", "2024-07-01"),
      ("https://example.com/b", "")))
  }

  test("parse: garbage and empty documents yield no rows, never throw") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, ""), (2L, "not xml at all"),
      (3L, "<urlset></urlset>"), (4L, "<urlset><url></url></urlset>"))
      .toDF("sitemap_id", "xml")
    assert(Sitemaps.parse(docs).count() == 0L)
  }

  test("xmlUnescape: amp decoded last so it cannot re-activate others") {
    val s = spark
    import s.implicits._
    // '&amp;lt;' must decode to the literal text '&lt;', NOT '<'
    val out = Seq("a &amp;lt; b").toDF("t")
      .select(Sitemaps.xmlUnescape(org.apache.spark.sql.functions
        .col("t")).as("u"))
      .collect().head.getString(0)
    assert(out == "a &lt; b")
  }
}
