package graft

import org.scalatest.funsuite.AnyFunSuite

/** The graded bench artifact keeps only the last 2000 chars of stdout
  * (the sbt "[success] ..." epilogue included), so Bench's ONE metric
  * line must stay under ~1900 chars to arrive parseable — every earlier
  * round's artifact was front-truncated and lost its query map. Pin the
  * size contract and JSON validity of the compact renderer here.
  */
class BenchLineSpec extends AnyFunSuite {

  private val liveNames = graft.SparkEntry.queries.keys.toSeq.sorted
  // grown worst case: the live set plus 10 long-named future queries —
  // full names + controls cannot fit this (measured 2058 chars at 1dp),
  // so it must land on the truncated-key fallback tier
  private val grownNames =
    (liveNames ++ (0 until 10).map(i => s"q_future_long_query_name_$i")).sorted

  private def mkResults(names: Seq[String]) = names.zipWithIndex.map {
    case (n, i) =>
      n -> (i % 7 match {
        case 0 => 123.456789
        case 1 => 0.004
        case _ => i * 0.37
      })
  }

  private def mkLine(results: Seq[(String, Double)]) = Bench.compactLine(
    results, 32, "/root/testdata/sf0.1",
    loFs = Seq(38.8, 46.39, 45.03, 44.65),
    hiFs = Seq(27.59, 29.25, 26.92, 26.9),
    rateLo = 179183L, rateHi = 297357L,
    effMed = 0.415, effCtrl = 0.643,
    mhLo = 16.58, mhHi = 6.62, mhEff = 0.651,
    bwLo = 65.93, bwHi = 73.58, bwEff = 0.279,
    xd1 = 5.993, xd2 = 14.15, xs1 = 49276L, xs2 = 48073L, xlive = 97349L)

  private def parse(line: String) =
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)

  test("live-set line fits with margin and carries full query names") {
    val line = mkLine(mkResults(liveNames))
    assert(line.length <= 1800,
      s"live line is ${line.length} chars; budget 1900 with 100 headroom")
    assert(!line.contains("\n"))
    val root = parse(line)
    assert(root.get("metric").asText == "total")
    assert(root.get("unit").asText == "sec")
    val qs = root.get("queries")
    assert(qs.size == liveNames.size)
    liveNames.foreach { n =>
      assert(qs.has(n.stripPrefix("q_")), s"missing query key for $n")
    }
    assert(root.get("frontier").get("eff").isNumber)
    assert(root.get("frontier").get("ups32").asLong == 297357L)
    assert(root.get("frontier").get("s8").isNumber)
    assert(root.get("mh_ctrl").get("eff").isNumber)
    assert(root.get("stream").get("gbps8").isNumber)
    assert(root.get("xdedup").get("surv1").asLong == 49276L)
    assert(root.get("sf").asText == "sf0.1")
  }

  test("grown set still fits: every timing kept under attributable keys") {
    val results = mkResults(grownNames)
    val line = mkLine(results)
    assert(line.length <= 1900,
      s"grown line is ${line.length} chars; driver tail keeps 2000")
    val qs = parse(line).get("queries")
    assert(qs.size == results.size, "a query timing was dropped")
    // every key must be a prefix-derived handle of exactly one name
    val it = qs.fieldNames()
    while (it.hasNext) {
      val k = it.next()
      val stem = k.takeWhile(_ != '~')
      assert(grownNames.exists(_.stripPrefix("q_").startsWith(stem)),
        s"key $k not attributable to any query name")
    }
  }
}
