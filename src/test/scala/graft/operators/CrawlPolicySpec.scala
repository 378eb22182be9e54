package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CrawlPolicySpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  test("refreshSchedule: hand-walked halve/double fold with clamps") {
    val s = spark
    import s.implicits._
    // url a: versions 1,1,2,2,2 at t=0..400 step 100
    //   t0: init 1000; t100 same -> 2000; t200 changed -> 1000;
    //   t300 same -> 2000; t400 same -> 4000 (cap) -> next due 4400...
    //   cap at 4000 exercises maxInterval
    val fetches = Seq(
      ("a", 0L, 1L), ("a", 100L, 1L), ("a", 200L, 2L),
      ("a", 300L, 2L), ("a", 400L, 2L),
      // url b: every fetch changes -> floor clamp
      ("b", 0L, 1L), ("b", 10L, 2L), ("b", 20L, 3L), ("b", 30L, 4L),
      // url c: single fetch -> init interval, no changes
      ("c", 5L, 9L)
    ).toDF("url", "fetch_epoch", "version")
    val out = CrawlPolicy.refreshSchedule(fetches,
        initIntervalS = 1000L, minIntervalS = 300L, maxIntervalS = 4000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // a: 1000 ->(same) 2000 ->(chg) 1000 ->(same) 2000 ->(same) 4000
    assert(out("a") == ((5L, 1L, 4000L, 4400L)))
    // b: 1000 ->(chg) 500 ->(chg) 300(floor: 250<300) ->(chg) 300
    assert(out("b") == ((4L, 3L, 300L, 330L)))
    assert(out("c") == ((1L, 0L, 1000L, 1005L)))
  }

  test("refreshSchedule: out-of-order input is folded in time order") {
    val s = spark
    import s.implicits._
    val shuffled = Seq(
      ("a", 200L, 2L), ("a", 0L, 1L), ("a", 100L, 1L)
    ).toDF("url", "fetch_epoch", "version")
    val out = CrawlPolicy.refreshSchedule(shuffled,
        initIntervalS = 1000L, minIntervalS = 300L, maxIntervalS = 4000L)
      .collect().head
    // time order 0,100,200: init -> same(2000) -> changed(1000)
    assert(out.getLong(3) == 1000L && out.getLong(4) == 1200L)
  }

  test("refreshSchedule: string fingerprints drive change detection") {
    val s = spark
    import s.implicits._
    // md5-like string versions must compare as strings — a numeric
    // cast would null them out and read as "never changed"
    val fetches = Seq(
      ("a", 0L, "d41d8cd9"), ("a", 100L, "d41d8cd9"),
      ("a", 200L, "900150983")
    ).toDF("url", "fetch_epoch", "version")
    val out = CrawlPolicy.refreshSchedule(fetches,
        initIntervalS = 1000L, minIntervalS = 300L, maxIntervalS = 4000L)
      .collect().head
    // init -> same(2000) -> changed(1000); one change counted
    assert(out.getLong(2) == 1L)
    assert(out.getLong(3) == 1000L)
  }

  test("revisitRecords: first capture per digest wins, epoch+url tie") {
    val s = spark
    import s.implicits._
    val caps = Seq(
      ("u1", 100L, "d1"), ("u2", 50L, "d1"), ("u3", 50L, "d1"),
      ("u4", 10L, "d2")
    ).toDF("url", "fetch_epoch", "digest")
    val out = CrawlPolicy.revisitRecords(caps)
      .collect().map(r => r.getString(0) ->
        (r.getString(3), Option(r.getString(4)),
          if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    // d1's original is u2@50 (epoch tie with u3 broken by url)
    assert(out("u2") == (("response", None, None)))
    assert(out("u3") == (("revisit", Some("u2"), Some(50L))))
    assert(out("u1") == (("revisit", Some("u2"), Some(50L))))
    assert(out("u4") == (("response", None, None)))
  }

  test("trapTemplates: hex collapses before digits; bounded spaces pass") {
    val s = spark
    import s.implicits._
    // 60 distinct calendar days + 60 session ids on one host (traps at
    // maxPerTemplate=50), 7 normal pages on another (not a trap)
    val urls =
      (0 until 60).map(i => s"https://a.com/cal/2024/$i") ++
      (0 until 60).map(i => s"https://a.com/view?sid=deadbeef$i${"0" * 8}") ++
      (0 until 200).map(i => s"https://b.com/p${i % 7}")
    val out = CrawlPolicy.trapTemplates(urls.toDF("url")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_urls"), r.getAs[Boolean]("trap"))).toMap
    assert(out(("a.com", "/cal/#/#")) == (60L, true))
    // the whole deadbeef<i>00000000 run is one hex token -> '~'
    assert(out(("a.com", "/view?sid=~")) == (60L, true))
    assert(out(("b.com", "/p#")) == (7L, false))
  }

  test("trapGate drops flagged templates, keeps everything else") {
    val s = spark
    import s.implicits._
    val urls = ((0 until 60).map(i => s"https://a.com/cal/2024/$i") ++
      Seq("https://a.com/about", "https://b.com/p1")).toDF("url")
    val traps = CrawlPolicy.trapTemplates(urls)
    val kept = CrawlPolicy.trapGate(urls, traps)
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("https://a.com/about", "https://b.com/p1"))
  }

  test("dumpDiff labels added/removed/changed/same from one outer join") {
    val s = spark
    import s.implicits._
    val prev = Seq(("u1", "h1"), ("u2", "h2"), ("u3", "h3"))
      .toDF("url", "digest")
    val cur = Seq(("u1", "h1"), ("u2", "hX"), ("u4", "h4"))
      .toDF("url", "digest")
    val got = CrawlPolicy.dumpDiff(prev, cur)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("u1" -> "same", "u2" -> "changed",
      "u3" -> "removed", "u4" -> "added"))
  }

  test("soft404Gate: 200-but-error flagged, real content and 404 not") {
    val s = spark
    import s.implicits._
    val pages = Seq(
      (1L, 200, "<html><title>Welcome</title>body</html>"),
      (2L, 200, "<html><title>404 - Page Not Found</title>x</html>"),
      (3L, 200, "<html><h1>this page no longer exists</h1>x</html>"),
      (4L, 404, "<html><title>gone</title></html>"),
      (5L, 200, "<html><p>mentions 404 in body text only</p></html>"),
      (6L, 200, "<html><title>my page does not exist yet :)</title></html>")
    ).toDF("page_id", "status", "html")
    val got = CrawlPolicy.soft404Gate(pages)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(3), r.getBoolean(4))).toMap
    assert(got(1L) == (false, false))
    assert(got(2L) == (true, true))
    assert(got(3L) == (true, true))
    assert(got(4L) == (false, true)) // hard 404: gone, not soft
    assert(got(5L) == (false, false)) // body mention without title/h1
    assert(got(6L) == (true, true))   // pattern is heuristic by design
  }

  test("mirrorHosts: score, minShared cut, boilerplate-digest guard") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      // A={1,2,3,4}, B={1,2,5}: 2 shared -> score 2/3
      ("A", "d1"), ("A", "d2"), ("A", "d3"), ("A", "d4"),
      ("B", "d1"), ("B", "d2"), ("B", "d5"),
      // C shares only d3 with A -> below minShared=2, pair absent
      ("C", "d3"), ("C", "d6"),
      // duplicate rows collapse before counting
      ("A", "d1"), ("B", "d2"),
      // boilerplate digest on 4 hosts: dropped at maxHostsPerDigest=3,
      // so it feeds neither pairs nor denominators
      ("A", "x"), ("B", "x"), ("C", "x"), ("D", "x"), ("D", "d9")
    ).toDF("host", "digest")
    val got = CrawlPolicy.mirrorHosts(docs, minShared = 2,
        maxHostsPerDigest = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(got == Map(("A", "B") -> (2L, 4L, 3L, 0.666667)))

    // full mirror scores 1.0 even when the other side is larger
    val full = Seq(("A", "d1"), ("A", "d2"), ("A", "d3"),
      ("B", "d1"), ("B", "d2")).toDF("host", "digest")
    val g2 = CrawlPolicy.mirrorHosts(full, minShared = 2,
        maxHostsPerDigest = 3)
      .collect().map(r => r.getDouble(5)).toSeq
    assert(g2 == Seq(1.0))
  }

  test("politenessAudit: gaps, violations, single-fetch hosts") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("h1", 0L, 0L), ("h1", 10L, 1L), ("h1", 12L, 2L), ("h1", 30L, 3L),
      ("h2", 100L, 4L)).toDF("host", "fetch_epoch", "ord")
    val rows = CrawlPolicy.politenessAudit(df, minDelayS = 5L)
      .collect().map(r => r.getString(0) -> r).toMap
    // gaps: 10, 2, 18 -> min 2, mean 10.0, one violation (2 < 5)
    val h1 = rows("h1")
    assert(h1.getLong(1) == 4L && h1.getLong(2) == 3L &&
      h1.getLong(3) == 2L && h1.getDouble(4) == 10.0 &&
      h1.getLong(5) == 1L)
    // single fetch: no gaps -> null min/mean, zero violations
    val h2 = rows("h2")
    assert(h2.getLong(1) == 1L && h2.getLong(2) == 0L &&
      h2.isNullAt(3) && h2.isNullAt(4) && h2.getLong(5) == 0L)
  }

  test("ewmaForecast: fold order, seed, and the alpha mix") {
    val s = spark
    import s.implicits._
    val df = Seq(("h", 0L, 8L), ("h", 1L, 4L), ("h", 2L, 16L),
      ("solo", 0L, 5L)).toDF("host", "dump", "x")
    val out = CrawlPolicy.ewmaForecast(df, "host", "dump", "x",
        num = 1, den = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    // e0=8; e1=(4+3*8)/4=7; e2=(16+3*7)/4=9.25
    assert(out("h") == ((3L, 9.25)))
    assert(out("solo") == ((1L, 5.0)))
  }

  test("changeRate: bias-corrected Poisson estimator, clamps, and " +
      "no-evidence URLs dropped") {
    val s = spark
    import s.implicits._
    // u1: 5 fetches over 4 days, 2 changes (v 1->1->2->2->3)
    val day = 86400L
    val u1 = (0 to 4).map(i =>
      ("u1", i * day, Seq(1L, 1L, 2L, 2L, 3L)(i), i.toLong))
    // u2: never changes -> lambda 0, interval capped at max
    val u2 = (0 to 3).map(i => ("u2", i * day * 2, 7L, i.toLong))
    // u3: single fetch -> dropped; u4: all same epoch -> dropped
    val rest = Seq(("u3", 0L, 1L, 0L), ("u4", 5L, 1L, 0L),
      ("u4", 5L, 2L, 1L))
    val df = (u1 ++ u2 ++ rest)
      .toDF("url", "fetch_epoch", "version", "ord")
    val out = CrawlPolicy.changeRate(df, minIntervalS = 3600L,
        maxIntervalS = 1209600L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(out.keySet == Set("u1", "u2"))
    val (n1, x1, lam1, next1, due1) = out("u1")
    assert(n1 == 4L && x1 == 2L)
    // lambda_day = -ln((4-2+0.5)/(4+0.5)) / 86400 * 86400 = ln(4.5/2.5)
    val want = BigDecimal(math.log(4.5 / 2.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(lam1 - want) < 1e-9)
    // optimal interval 1/lam ~ 146958 s, inside the clamp
    assert(next1 == math.floor(86400.0 / math.log(4.5 / 2.5)).toLong)
    assert(due1 == 4 * 86400L + next1)
    val (n2, x2, lam2, next2, _) = out("u2")
    assert(n2 == 3L && x2 == 0L && lam2 == 0.0)
    assert(next2 == 1209600L, "no observed change -> max interval")
  }
}
