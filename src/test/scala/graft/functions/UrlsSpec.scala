package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class UrlsSpec extends AnyFunSuite {

  test("unquoteOnce decodes percent escapes like Python unquote") {
    assert(Urls.unquoteOnce("abc%20def") == "abc def")
    assert(Urls.unquoteOnce("a%2561b") == "a%61b")
    assert(Urls.unquoteOnce("%C3%A9") == "é")
    assert(Urls.unquoteOnce("no-escapes") == "no-escapes")
    // malformed escapes pass through
    assert(Urls.unquoteOnce("%zz%1") == "%zz%1")
    // invalid UTF-8 -> replacement char (Python errors='replace')
    assert(Urls.unquoteOnce("%ff") == "�")
    // trailing % preserved
    assert(Urls.unquoteOnce("x%") == "x%")
  }

  test("unquoteInf reaches the fixpoint of multi-quoted URLs") {
    assert(Urls.unquoteInf("a%2561b") == "aab")
    assert(Urls.unquoteInf("%252561") == "a")
    assert(Urls.unquoteInf("plain") == "plain")
  }

  test("unquoteInf is idempotent (seeded random strings)") {
    val rnd   = new scala.util.Random(42)
    val chars = "abc%20%25AF/:?=%&xyz"
    (1 to 500).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(30))(chars(rnd.nextInt(chars.length))).mkString
      val once = Urls.unquoteInf(s)
      assert(Urls.unquoteInf(once) == once, s"input: $s")
    }
  }

  test("host extracts netloc like urlsplit") {
    assert(Urls.host("https://www.example.com/path?q=1") == "www.example.com")
    assert(Urls.host("http://h1.example.org") == "h1.example.org")
    assert(Urls.host("http://user:pw@h.com:8080/x") == "user:pw@h.com:8080")
    assert(Urls.host("//cdn.example.com/x") == "cdn.example.com")
    assert(Urls.host("no-scheme/path") == "")
  }

  test("stripWww strips only the listed prefixes") {
    assert(Urls.stripWww("www.example.com") == "example.com")
    assert(Urls.stripWww("www2.example.com") == "example.com")
    assert(Urls.stripWww("ww3.example.com") == "example.com")
    assert(Urls.stripWww("www9.example.com") == "www9.example.com")
    assert(Urls.stripWww("example.com") == "example.com")
  }

  test("surtKey reverses labels and drops the www-ish head") {
    assert(Urls.surtKey("www.elte.hu") == "hu,elte")
    assert(Urls.surtKey("www9.elte.hu") == "hu,elte")
    assert(Urls.surtKey("www10.elte.hu") == "hu,elte,www10")
    assert(Urls.surtKey("*.elte.hu") == "hu,elte")
    assert(Urls.surtKey("a.b.c") == "c,b,a")
  }

  test("bareUrl reproduces the find('://') quirk") {
    assert(Urls.bareUrl("https://a.com/x") == "a.com/x")
    assert(Urls.bareUrl("nocolon") == "colon") // find -1 -> url[2:]
  }

  test("stripTrackingCol: removes noise params, re-promotes '?', keeps fragments") {
    val s = graft.TestSpark.spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // leading tracking pair: the '&' survivor is promoted to '?'
      ("https://a/p?utm_source=m1&id=3", "https://a/p?id=3"),
      // trailing tracking pair: plain removal
      ("https://a/p?id=3&fbclid=xyz", "https://a/p?id=3"),
      // multiple tracking pairs around a survivor
      ("https://a/p?gclid=g&utm_campaign=c&page=2", "https://a/p?page=2"),
      // all-tracking query: '?' disappears entirely
      ("https://a/p?utm_a=1&utm_b=2", "https://a/p"),
      // fragment text is not a query param
      ("https://a/p?a=1#utm_inside=keep", "https://a/p?a=1#utm_inside=keep"),
      // no query at all
      ("https://a/p", "https://a/p"))
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), graft.functions.Urls.stripTrackingCol(col("url")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) => assert(got(in) == want, in) }
  }

  test("homoglyphSkeleton maps confusables; clean hosts unchanged") {
    val s = graft.TestSpark.spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val spoofG = "gооgle.com"        // Cyrillic о
    val spoofP = "рауpal.com"   // Cyrillic р а у
    val cases = Seq(
      spoofG -> "google.com",
      spoofP -> "paypal.com",
      "GOOGLE.com" -> "google.com",            // lower-cased first
      "example.com" -> "example.com")
    val got = cases.map(_._1).toDF("h")
      .select(col("h"), Urls.homoglyphSkeletonCol(col("h")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) => assert(got(in) == want, in) }
    // the fixture strings really are non-Latin before skeletoning
    assert(spoofG != "google.com" && spoofP != "paypal.com")
  }

  test("resolveUrlCol: RFC 3986 §5.4 reference vectors (fragments " +
      "dropped by design)") {
    val s = graft.TestSpark.spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val base = "http://a/b/c/d;p?q"
    // §5.4.1 normal + §5.4.2 abnormal examples; expectations match the
    // RFC except that fragments are stripped (crawler URL space)
    val cases = Seq(
      "g" -> "http://a/b/c/g",
      "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/",
      "/g" -> "http://a/g",
      "//g" -> "http://g/",
      "?y" -> "http://a/b/c/d;p?y",
      "g?y" -> "http://a/b/c/g?y",
      "" -> "http://a/b/c/d;p?q",
      "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/",
      ".." -> "http://a/b/",
      "../" -> "http://a/b/",
      "../g" -> "http://a/b/g",
      "../.." -> "http://a/",
      "../../" -> "http://a/",
      "../../g" -> "http://a/g",
      // abnormal: .. past root stays at root
      "../../../g" -> "http://a/g",
      "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g",
      "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.",
      ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..",
      "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g",
      "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h",
      "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y",
      // query is never path-normalized
      "g?y/./x" -> "http://a/b/c/g?y/./x",
      "g?y/../x" -> "http://a/b/c/g?y/../x",
      // fragment-bearing forms: ours drop the fragment (documented)
      "#s" -> "http://a/b/c/d;p?q",
      "g#s" -> "http://a/b/c/g",
      "g?y#s" -> "http://a/b/c/g?y",
      // strict-parser absolute forms
      "http:g" -> "http:g",
      "https://other.org/p/../q.html#f" -> "https://other.org/q.html",
      "mailto:x@y.z" -> "mailto:x@y.z")
    val got = cases.map(_._1).toDF("href")
      .select(col("href"),
        Urls.resolveUrlCol(lit(base), col("href")).as("r"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (href, want) =>
      assert(got(href) == want, s"href=<$href>")
    }
  }
}
