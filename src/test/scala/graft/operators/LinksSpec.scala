package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LinksSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def resolve(base: String, href: String): Option[String] = {
    val s = spark
    import s.implicits._
    graft.expressions.UrlExpressions.register(s)
    Option(Seq((base, href)).toDF("b", "h")
      .select(Links.resolveCol(col("b"), col("h")))
      .head().getString(0))
  }

  test("resolveCol covers the RFC 3986 crawler cases") {
    val base = "https://a.com/d1/d2/page.html?q=1#top"
    assert(resolve(base, "https://b.org/x") == Some("https://b.org/x"))
    assert(resolve(base, "HTTP://B.ORG/x") == Some("HTTP://B.ORG/x"))
    assert(resolve(base, "//cdn.net/y") == Some("https://cdn.net/y"))
    assert(resolve(base, "/root.html") == Some("https://a.com/root.html"))
    assert(resolve(base, "sib.html") == Some("https://a.com/d1/d2/sib.html"))
    assert(resolve(base, "./sib.html") == Some("https://a.com/d1/d2/sib.html"))
    assert(resolve(base, "../up.html") == Some("https://a.com/d1/up.html"))
    assert(resolve(base, "../../top.html") == Some("https://a.com/top.html"))
    // fragments stripped from survivors
    assert(resolve(base, "sib.html#sec2") ==
      Some("https://a.com/d1/d2/sib.html"))
    // host-only base resolves relatives against '/'
    assert(resolve("https://a.com", "p.html") == Some("https://a.com/p.html"))
  }

  test("resolveCol drops non-fetchable and empty targets") {
    val base = "https://a.com/p"
    Seq("mailto:x@y.z", "javascript:void(0)", "tel:+123", "data:text/x,1",
      "", "#frag").foreach { h =>
      assert(resolve(base, h).isEmpty, s"href '$h' must drop")
    }
  }

  test("outlinks: both quote styles extracted, entities decoded, deduped") {
    val s = spark
    import s.implicits._
    val html = """<a href="/a">1</a><a href='/b'>2</a>""" +
      """<a class="x" href="/c?p=1&amp;q=2">3</a><a href="/a">dup</a>"""
    val out = Links.outlinks(
      Seq((1L, "https://h.co/base/p", html)).toDF("page_id", "url", "html"))
      .collect().map(_.getString(2)).toSet
    assert(out == Set("https://h.co/a", "https://h.co/b",
      "https://h.co/c?p=1&q=2"))
  }

  test("frontierCandidates strips tracking params from resolved links") {
    val s = spark
    import s.implicits._
    val html = """<a href="/p?utm_source=x&id=7">l</a>"""
    val out = Links.frontierCandidates(
      Seq((1L, "https://h.co/", html)).toDF("page_id", "url", "html"))
      .collect().map(_.getString(0)).toSet
    assert(out == Set("https://h.co/p?id=7"))
  }

  test("nofollow: rel'd anchors and robots-meta pages are not enqueued") {
    val s = spark
    import s.implicits._
    val follow = """<a href="/ok">k</a><a rel="nofollow" href="/paid">p</a>""" +
      """<a rel='ugc nofollow' href='/ugc'>u</a>"""
    val metaPage = """<meta name="robots" content="noindex, nofollow">""" +
      """<a href="/never">n</a>"""
    val out = Links.outlinks(Seq(
        (1L, "https://h.co/", follow),
        (2L, "https://h.co/", metaPage)).toDF("page_id", "url", "html"))
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(out.toSet == Set((1L, "https://h.co/ok")))
  }
}
