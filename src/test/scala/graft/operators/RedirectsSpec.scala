package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class RedirectsSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  /** Single-threaded walk reference. */
  private def walk(edges: Map[Long, Long], src: Long, maxHops: Int)
      : Option[(Long, Long)] = {
    var cur = edges(src); var hops = 1L
    while (hops <= maxHops && edges.contains(cur)) {
      cur = edges(cur); hops += 1
    }
    if (hops <= maxHops && !edges.contains(cur)) Some((cur, hops)) else None
  }

  private def run(edges: Seq[(Long, Long)], maxHops: Int)
      : Map[Long, Option[(Long, Long)]] = {
    val s = spark
    import s.implicits._
    Redirects.resolveRedirects(edges.toDF("src", "dst"), maxHops = maxHops)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.getBoolean(3)) Some((r.getLong(1), r.getLong(2))) else None))
      .toMap
  }

  test("hand cases: chain, tie to terminal, 2-cycle, self-loop") {
    // 1 -> 2 -> 3 -> 40 (terminal); 10 <-> 11 cycle; 20 -> 20 self-loop
    val got = run(Seq(1L -> 2L, 2L -> 3L, 3L -> 40L,
      10L -> 11L, 11L -> 10L, 20L -> 20L), maxHops = 16)
    assert(got(1L) == Some((40L, 3L)))
    assert(got(2L) == Some((40L, 2L)))
    assert(got(3L) == Some((40L, 1L)))
    assert(got(10L) == None)
    assert(got(11L) == None)
    assert(got(20L) == None)
  }

  test("distance exactly maxHops resolves; maxHops+1 does not") {
    // 0 -> 1 -> ... -> 8 (terminal): dist(0)=8
    val edges = (0L until 8L).map(i => i -> (i + 1))
    val at8 = run(edges, maxHops = 8)
    assert(at8(0L) == Some((8L, 8L)))
    val at7 = run(edges, maxHops = 7)
    assert(at7(0L) == None)
    assert(at7(1L) == Some((8L, 7L)))
  }

  test("non-power-of-two cap: dist in (maxHops, 2^rounds] flags unresolved") {
    // rounds = ceil(log2(6)) = 3 -> doubling reaches 8 hops; dist 7 and 8
    // must still be flagged because the CAP is 6
    val edges = (0L until 8L).map(i => i -> (i + 1))
    val at6 = run(edges, maxHops = 6)
    assert(at6(0L) == None) // dist 8
    assert(at6(1L) == None) // dist 7
    assert(at6(2L) == Some((8L, 6L)))
  }

  test("random functional graph matches the single-threaded walk") {
    val rnd = new scala.util.Random(11)
    val edges = (0L until 400L).filter(_ => rnd.nextInt(5) > 0)
      .map(i => i -> rnd.nextLong(420L)).toMap
    val got = run(edges.toSeq, maxHops = 16)
    assert(got.keySet == edges.keySet)
    edges.keys.foreach { s =>
      assert(got(s) == walk(edges, s, 16), s"src $s")
    }
  }
}
