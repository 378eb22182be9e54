package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class PublicSuffixSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  // publicsuffix.org's own test-psl shapes: normal, wildcard, exception
  private val rules = Seq(
    "com", "uk", "co.uk", "github.io",
    "*.ck", "!www.ck", "jp", "*.kawasaki.jp", "!city.kawasaki.jp",
    "// comments are ignored", "")

  test("registeredDomain: PSL normal/wildcard/exception semantics") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      // host -> (public_suffix, reg_domain)
      ("example.com", ("com", "example.com")),
      ("www.example.com", ("com", "example.com")),
      ("b.site.co.uk", ("co.uk", "site.co.uk")),
      ("uk", ("uk", null)),
      ("co.uk", ("co.uk", null)),
      ("user.github.io", ("github.io", "user.github.io")),
      // *.ck: any single label under ck is a public suffix
      ("foo.ck", ("foo.ck", null)),
      ("shop.foo.ck", ("foo.ck", "shop.foo.ck")),
      // !www.ck: exception carves www.ck back out as registrable
      ("www.ck", ("ck", "www.ck")),
      ("sub.www.ck", ("ck", "www.ck")),
      ("kawasaki.jp", ("jp", "kawasaki.jp")),
      ("z.kawasaki.jp", ("z.kawasaki.jp", null)),
      ("y.z.kawasaki.jp", ("z.kawasaki.jp", "y.z.kawasaki.jp")),
      ("city.kawasaki.jp", ("kawasaki.jp", "city.kawasaki.jp")),
      ("x.city.kawasaki.jp", ("kawasaki.jp", "city.kawasaki.jp")),
      // no rule matches -> default * = bare TLD
      ("example.test", ("test", "example.test")),
      ("a.b.example.test", ("test", "example.test")),
      ("test", ("test", null)))
    val df = cases.map(_._1).toDF("host")
    val out = PublicSuffix
      .registeredDomain(df, "host", PublicSuffix.rulesDf(s, rules))
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    cases.foreach { case (h, want) => assert(out(h) == want, s"host=$h") }
  }

  test("rulesDf drops comments/blanks and tags kinds") {
    val s = spark
    val parsed = PublicSuffix.rulesDf(s, rules).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(parsed.size == 9)
    assert(parsed("ck") == "w" && parsed("www.ck") == "e" &&
      parsed("co.uk") == "n")
  }
}
