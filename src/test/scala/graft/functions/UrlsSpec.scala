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
}
