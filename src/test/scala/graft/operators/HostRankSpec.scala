package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** HostRank against a hand-computed 3-node graph: 1→2, 2→1, 3→2.
  * scale=1e6, damping 85/100, so every Long division is checkable on
  * paper: init = 333333, teleport = (1e6*15/100)/3 = 50000, each edge
  * contribution after one iteration = ((333333*85)//100)//1 = 283333.
  */
class HostRankSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def graph = {
    val s = spark
    import s.implicits._
    (Seq((1L, 2L), (2L, 1L), (3L, 2L)).toDF("src", "dst"),
      Seq(1L, 2L, 3L).toDF("host"))
  }

  test("one iteration matches the hand computation") {
    val (ed, nodes) = graph
    val out = HostRank.pageRank(ed, nodes, iters = 1, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out(1L)._1 == 50000L + 283333L)      // from 2
    assert(out(2L)._1 == 50000L + 2 * 283333L)  // from 1 and 3
    assert(out(3L)._1 == 50000L)                // unlinked: teleport only
    assert(out(2L)._2 == 0.616666)              // display = mu/scale @6dp
  }

  test("second iteration redistributes through the cycle") {
    val (ed, nodes) = graph
    val r1 = Map(1L -> 333333L, 2L -> 616666L, 3L -> 50000L)
    def c(r: Long) = (r * 85L / 100L) / 1L
    val out = HostRank.pageRank(ed, nodes, iters = 2, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 50000L + c(r1(2L)))
    assert(out(2L) == 50000L + c(r1(1L)) + c(r1(3L)))
    assert(out(3L) == 50000L)
  }

  test("string host ids (real hostnames) rank identically to longs") {
    val s = spark
    import s.implicits._
    val name = Map(1L -> "a.com", 2L -> "b.org", 3L -> "c.net")
    val ed = Seq(("a.com", "b.org"), ("b.org", "a.com"),
      ("c.net", "b.org")).toDF("src", "dst")
    val nodes = name.values.toSeq.toDF("host")
    val got = HostRank.pageRank(ed, nodes, iters = 1, scale = 1000000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (edL, nodesL) = graph
    val want = HostRank.pageRank(edL, nodesL, iters = 1,
      scale = 1000000L).collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == want.map { case (k, v) => name(k) -> v })
  }

  test("duplicate and self edges are ignored; iters=0 is uniform") {
    val s = spark
    import s.implicits._
    val ed = Seq((1L, 2L), (1L, 2L), (1L, 1L), (2L, 1L), (3L, 2L))
      .toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L).toDF("host")
    val two = HostRank.pageRank(ed, nodes, iters = 1, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (cleanEd, _) = graph
    val clean = HostRank.pageRank(cleanEd, nodes, iters = 1,
      scale = 1000000L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == clean)
    val zero = HostRank.pageRank(cleanEd, nodes, iters = 0,
      scale = 1000000L).collect().map(_.getLong(1)).toSet
    assert(zero == Set(333333L))
  }

  test("anchorText: counts, tie-break, k cap, distinct hosts") {
    val s = spark
    import s.implicits._
    val links = Seq(
      ("h1", "t", "docs"), ("h1", "t", "docs"), ("h2", "t", "docs"),
      ("h2", "t", "blog"), ("h3", "t", "blog"), ("h1", "t", "api"),
      ("h1", "t", "zzz"),                    // 4th anchor -> cut at k=3
      ("h9", "u", "home")).toDF("src_host", "dst", "anchor")
    val out = HostRank.anchorText(links).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_links"), r.getAs[Long]("n_src_hosts"),
         r.getAs[String]("top_anchor"), r.getAs[String]("top_anchors")))
      .toMap
    // docs=3, blog=2, api=1 ties zzz=1 -> anchor asc picks api
    assert(out("t") == (7L, 3L, "docs", "docs | blog | api"))
    assert(out("u") == (1L, 1L, "home", "home"))
  }

  test("hits matches a single-threaded integer replay; star graph sane") {
    val s = spark
    import s.implicits._
    // star: 0 links to 1..4; 5 also links to 1 -> 0 is the top hub,
    // 1 the top authority
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (5L, 1L))
    val nodes = (0L to 5L).toDF("host")
    val scale = 1000000L
    val got = HostRank.hits(edges.toDF("src", "dst"), nodes,
        iters = 3, scale = scale)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // independent JVM replay of the same integer half-steps
    var h = (0L to 5L).map(_ -> scale).toMap
    var a = h
    (1 to 3).foreach { _ =>
      val ar = (0L to 5L).map(n =>
        n -> edges.filter(_._2 == n).map(e => h(e._1)).sum).toMap
      val am = ar.values.max
      a = ar.map { case (k, v) => k -> (v * scale) / am }
      val hr = (0L to 5L).map(n =>
        n -> edges.filter(_._1 == n).map(e => a(e._2)).sum).toMap
      val hm = hr.values.max
      h = hr.map { case (k, v) => k -> (v * scale) / hm }
    }
    (0L to 5L).foreach { n =>
      assert(got(n) == (a(n), h(n)), s"host $n")
    }
    assert(got(0L)._2 == scale, "star center is the max-normalized hub")
    assert(got(1L)._1 == scale, "doubly-linked node is the top authority")
    assert(got(2L)._2 == 0L && got(2L)._1 > 0L)
  }

  test("triangles: K4 hand case and random-graph brute parity") {
    val s = spark
    import s.implicits._
    // K4 on 0..3 (4 triangles, 3 per node) + pendant 4 (none)
    val k4 = (for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b)) :+
      (3L, 4L)
    val got = HostRank.triangles(k4.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))

    val rnd = new scala.util.Random(9)
    val edges = (0 until 300).map(_ =>
      (rnd.nextLong(40), rnd.nextLong(40))).distinct
    val canon = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.distinct.toSet
    val want = scala.collection.mutable.Map.empty[Long, Long]
    for {
      (a, b) <- canon; c <- 0L until 40L
      if b < c && canon((a, c)) && canon((b, c))
    } Seq(a, b, c).foreach(n => want(n) = want.getOrElse(n, 0L) + 1)
    val got2 = HostRank.triangles(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == want.toMap)
  }

  test("bfsDepth: min hops from seeds, cap honored, random-graph parity") {
    val s = spark
    import s.implicits._
    // chain 0->1->2->3->4->5, shortcut 0->3, cycle 2<->1, island 9
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (0L, 3L), (2L, 1L), (8L, 9L))
    val got = HostRank.bfsDepth(edges.toDF("src", "dst"),
        Seq(0L).toDF("host"), maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L,
      5L -> 3L)) // 9 unreachable, island absent; 5 via the shortcut

    val rnd = new scala.util.Random(21)
    val re = (0 until 400).map(_ => (rnd.nextLong(60), rnd.nextLong(60)))
    val seeds = Seq(0L, 7L, 13L)
    val got2 = HostRank.bfsDepth(re.toDF("src", "dst"),
        seeds.toDF("host"), maxDepth = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: proper BFS
    val adj = re.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val ref = scala.collection.mutable.Map(seeds.map(_ -> 0L): _*)
    var frontier = seeds.toSet
    (1 to 5).foreach { d =>
      frontier = frontier.flatMap(n => adj.getOrElse(n, Seq.empty))
        .filterNot(ref.contains)
      frontier.foreach(n => ref(n) = d.toLong)
    }
    assert(got2 == ref.toMap)
  }

  test("trustRank: seed-restricted teleport, spam farm demoted, replay") {
    val s = spark
    import s.implicits._
    // good cluster 0<->1, 1->2; spam farm 3<->4 densely interlinked but
    // unreachable from the seed 0
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 2L), (3L, 4L), (4L, 3L))
    val nodes = (0L to 4L).toDF("host")
    val scale = 1000000L
    val got = HostRank.trustRank(edges.toDF("src", "dst"), nodes,
        Seq(0L).toDF("host"), iters = 3, scale = scale)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent JVM replay of the integer iterations
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = out.view.mapValues(_.size.toLong).toMap
    val tel = (scale * 15L / 100L) / 1L
    var r = (0L to 4L).map(n => n -> (if (n == 0L) scale else 0L)).toMap
    (1 to 3).foreach { _ =>
      r = (0L to 4L).map { n =>
        val in = edges.filter(_._2 == n)
          .map(e => ((r(e._1) * 85L) / 100L) / deg(e._1)).sum
        n -> ((if (n == 0L) tel else 0L) + in)
      }.toMap
    }
    assert(got == r)
    assert(got(3L) == 0L && got(4L) == 0L, "farm gets zero trust")
    assert(got(2L) > 0L, "host reachable from the seed keeps trust")

    // seeds outside the node universe don't count; inside-seed required
    assertThrows[IllegalArgumentException] {
      HostRank.trustRank(edges.toDF("src", "dst"), nodes,
        Seq(99L).toDF("host"), iters = 1, scale = scale).collect()
    }
  }

  test("kCorePeel: K5+chain hand case, brute parity, fixpoint") {
    val s = spark
    import s.implicits._
    // K5 on 0..4; chain 4-5-6-7 peels off round by round at k=3
    val k5 = for { a <- 0L to 4L; b <- 0L to 4L if a < b } yield (a, b)
    val edges = k5 ++ Seq((4L, 5L), (5L, 6L), (6L, 7L))
    val got = HostRank.kCorePeel(edges.toDF("src", "dst"), k = 3,
        rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 3-core = the K5; node 4's chain edge is gone, so deg 4 everywhere
    assert(got == (0L to 4L).map(_ -> 4L).toMap)

    // brute-force peel to fixpoint on a random graph; operator at a
    // rounds budget past fixpoint must agree, and stay stable +1 round
    val rnd = new scala.util.Random(5)
    val re = (0 until 250).map(_ => (rnd.nextLong(50), rnd.nextLong(50)))
    var canon = re.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.distinct
    var changed = true
    while (changed) {
      val deg = canon.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= 4).keySet
      val next = canon.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != canon.size
      canon = next
    }
    val wantDeg = canon.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 4)
    val g6 = HostRank.kCorePeel(re.toDF("src", "dst"), k = 4, rounds = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val g7 = HostRank.kCorePeel(re.toDF("src", "dst"), k = 4, rounds = 13)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g6 == wantDeg && g7 == wantDeg)
  }

  test("linkSignals: degrees and reciprocal counts") {
    val s = spark
    import s.implicits._
    val ed = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 4L), (1L, 2L), (2L, 2L))
    val got = HostRank.linkSignals(ed.toDF("src", "dst"))
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // distinct, self-loop dropped: 1->2, 2->1, 1->3, 3->4
    assert(got(1L) == (2L, 1L, 1L)) // out 2, in 1, reciprocal 1->2
    assert(got(2L) == (1L, 1L, 1L))
    assert(got(3L) == (1L, 1L, 0L))
    assert(got(4L) == (0L, 1L, 0L))
  }

  test("twoHopNeighbors: exact ring counts, direct links and self " +
      "excluded") {
    val s = spark
    import s.implicits._
    // 1->2, 1->3, 2->4, 3->4, 3->1, 4->1
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (3L, 1L),
      (4L, 1L)).toDF("src", "dst")
    val out = HostRank.twoHopNeighbors(edges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // 1: hops {2,3}; 2-hop {4,4,1} -> new {4} (1 is self)
    assert(out(1L) == ((2L, 1L)))
    // 2: hops {4}; via 4 -> {1} new
    assert(out(2L) == ((1L, 1L)))
    // 3: hops {4,1}; via 4 -> {1} direct, via 1 -> {2,3} -> new {2}
    assert(out(3L) == ((2L, 1L)))
    // 4: hops {1}; via 1 -> {2,3} new
    assert(out(4L) == ((1L, 2L)))
  }

  test("labelPropagation: components converge to one label each, " +
      "star centre wins, deterministic ties") {
    val s = spark
    import s.implicits._
    // component 1: star around "a" (a-b, a-c, a-d); component 2:
    // triangle x-y-z; one isolated self-loop edge is filtered out
    val edges = Seq(("a", "b"), ("a", "c"), ("a", "d"),
      ("x", "y"), ("y", "z"), ("z", "x"), ("q", "q"))
      .toDF("src", "dst")
    val out = HostRank.labelPropagation(edges, iters = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // leaves adopt the centre's label round 1 and keep it
    assert(out("b") == "a" && out("c") == "a" && out("d") == "a")
    // triangle: every node sees two neighbours with distinct labels ->
    // min-label tie-break drives all to "x"
    assert(out("x") == "x" && out("y") == "x" && out("z") == "x")
    // self-loop-only node never enters the universe
    assert(!out.contains("q"))
    // star centre oscillates (bipartite sync-LPA), but only within its
    // own component's labels — no cross-component leakage
    assert(out("a") == "b")
    assert(out.values.toSet.subsetOf(Set("a", "b", "x")))
  }
}
