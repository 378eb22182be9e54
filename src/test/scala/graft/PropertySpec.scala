package graft

import graft.functions.{Boilerplate, MinHashF, TextAnalysis}
import graft.state.CuckooChain
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized invariants (seeded, deterministic) + golden values for the
  * hash surface.
  *
  * The parity specs compare the distributed operators against the
  * sequential reference interpreters, but both sides share MinHashF — a
  * regression in the hash itself would pass parity silently. The golden
  * values below pin the actual numbers (including the ASCII window fast
  * path and the non-ASCII substring fallback).
  */
class PropertySpec extends AnyFunSuite {

  test("golden: minhash signature values (ASCII fast path)") {
    // family: (a*poly131(shingle) + b) mod 2^31-1 — golden values pin the
    // r3 Mersenne-31 family that the DuckDB oracles replay in BIGINT SQL
    val sig = MinHashF.signature("the quick brown fox jumps over the lazy dog")
    assert(sig.take(6).toSeq == Seq(10231510L, 13807883L, 37903590L,
      3075197L, 57253368L, 7455545L))
  }

  test("golden: minhash signature values (non-ASCII fallback path)") {
    val sig = MinHashF.signature("héllo wörld — ünïcode test ©")
    assert(sig.take(6).toSeq == Seq(60430245L, 7502025L, 4498014L,
      21466141L, 312300199L, 31908058L))
  }

  test("golden: simhash64") {
    assert(TextAnalysis.simhash64("the quick brown fox")
      == 5363936793200807308L)
  }

  test("property: signature is stable; adding shingles only lowers minima") {
    val rnd = new Random(42)
    (1 to 50).foreach { _ =>
      val s = Random.alphanumeric.take(5 + rnd.nextInt(80)).mkString
      val once  = MinHashF.signature(s)
      val twice = MinHashF.signature(s + s.takeRight(4) + s)
      assert(MinHashF.signature(s).toSeq == once.toSeq)
      assert(once.zip(twice).forall { case (a, b) => b <= a })
    }
  }

  test("property: cuckoo chain never loses an inserted key (Set model)") {
    val rnd = new Random(7)
    (1 to 5).foreach { _ =>
      val chain = CuckooChain.forCapacity(32) // force growth
      val keys  = Seq.fill(400)(rnd.nextLong())
      keys.foreach(k => assert(chain.insert(k)))
      assert(keys.forall(chain.contains), "no false negatives")
    }
  }

  test("property: cuckoo chain delete removes one copy, keeps the rest") {
    val chain = CuckooChain.forCapacity(16)
    val keys  = (0L until 200L).map(graft.fixtures.CrawlFixtures.mix)
    keys.foreach(chain.insert)
    keys.foreach(chain.insert) // two copies each
    keys.foreach { k =>
      assert(chain.delete(k))
      assert(chain.contains(k), "second copy must survive")
    }
  }

  test("property: boilerplate parser never throws, output is collapsed") {
    val rnd    = new Random(1234)
    val pieces = Vector("<p>", "</p>", "<div>", "</div>", "<a href=\"x\">",
      "</a>", "<script>", "</script>", "<br/>", "<", ">", "&amp;",
      "&bogus;", " ", "\n", "\t", "  ")
    (1 to 100).foreach { _ =>
      val html = Seq.fill(rnd.nextInt(60))(
        if (rnd.nextBoolean()) pieces(rnd.nextInt(pieces.length))
        else Random.alphanumeric.take(rnd.nextInt(12)).mkString).mkString
      val blocks = Boilerplate.parseBlocks(html)
      blocks.foreach { b =>
        assert(b.text == b.text.trim)
        assert(!b.text.contains("  ") && !b.text.contains("\n"))
        assert(b.link_chars >= 0 && b.link_chars <= b.text.length)
      }
      val cf = blocks.map(b =>
        Boilerplate.contextFreeClassLocal(b.text, b.link_chars))
      Boilerplate.reviseLocal(cf).foreach(c => assert(Set("good", "bad")(c)))
    }
  }

  test("property: skew-free politeness rank == window rank on random skews") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new Random(42)
    (0 until 4).foreach { trial =>
      // random host distribution: zipf-ish — a few giants, a long tail
      val nHosts = 1 + rnd.nextInt(30)
      val rows = (0 until 1500).map { i =>
        val h = s"h${(math.pow(rnd.nextDouble(), 3) * nHosts).toInt}"
        (h, i.toLong)
      }
      val df = rows.toDF("host_key", "pri").repartition(1 + rnd.nextInt(12))
      val got = graft.operators.Frontier.politenessRank(
          df, "host_key", Seq(asc("pri")), quota = Int.MaxValue)
        .select(col("host_key"), col("pri"), col("wave").cast("int"))
        .as[(String, Long, Int)].collect().toSet
      val want = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"host_key").orderBy(asc("pri"))
        df.withColumn("wave", row_number().over(w))
          .select("host_key", "pri", "wave")
          .as[(String, Long, Int)].collect().toSet
      }
      assert(got == want, s"trial $trial nHosts=$nHosts")
    }
  }

  test("property: robotsRules on randomized files matches a local parser") {
    // local reference parser: direct transcription of the RFC grouping
    def localRules(content: String, agent: String)
        : Set[(String, Boolean, Long)] = {
      val lines = content.split("\n").map(_.replaceAll("#.*$", "").trim)
        .filter(_.nonEmpty)
      case class G(agents: List[String], rules: List[(String, Boolean)],
                   delay: Option[Long])
      var groups = List.empty[G]
      var cur: G = null
      var lastWasUa = false
      lines.foreach { l =>
        val low = l.toLowerCase
        def v = l.substring(l.indexOf(':') + 1).trim
        if (low.startsWith("user-agent:")) {
          if (!lastWasUa) { if (cur != null) groups :+= cur; cur = G(Nil, Nil, None) }
          cur = cur.copy(agents = cur.agents :+ v); lastWasUa = true
        } else {
          lastWasUa = false
          if (cur != null) {
            if (low.startsWith("allow:") && v.nonEmpty)
              cur = cur.copy(rules = cur.rules :+ (v, true))
            else if (low.startsWith("disallow:") && v.nonEmpty)
              cur = cur.copy(rules = cur.rules :+ (v, false))
            else if (low.startsWith("crawl-delay:"))
              cur = cur.copy(delay = cur.delay.orElse(Some(v.toLong)))
          }
        }
      }
      if (cur != null) groups :+= cur
      def spec(g: G) =
        if (g.agents.exists(_.equalsIgnoreCase(agent))) 2
        else if (g.agents.contains("*")) 1 else 0
      val best = groups.map(spec).maxOption.getOrElse(0)
      if (best == 0) Set.empty
      else {
        val chosen = groups.filter(spec(_) == best)
        val delay = chosen.flatMap(_.delay).minOption.getOrElse(1L)
        chosen.flatMap(_.rules).map { case (p, a) => (p, a, delay) }.toSet
      }
    }
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new Random(7)
    val agents = Seq("*", "googlebot", "otherbot")
    val files = (0 until 30).map { i =>
      val n = 2 + rnd.nextInt(10)
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        rnd.nextInt(6) match {
          case 0 | 1 => sb.append(s"User-agent: ${agents(rnd.nextInt(3))}\n")
          case 2 => sb.append(s"Disallow: /d${rnd.nextInt(5)}\n")
          case 3 => sb.append(s"Allow: /a${rnd.nextInt(5)}\n")
          case 4 => sb.append(s"Crawl-delay: ${1 + rnd.nextInt(9)}\n")
          case 5 => sb.append(s"# noise ${rnd.nextInt(100)}\n")
        }
      }
      (s"host$i", sb.toString)
    }
    val got = graft.operators.Frontier.robotsRules(
        files.toDF("host_key", "content"), agent = "googlebot")
      .select("host_key", "path_prefix", "allow", "crawl_delay")
      .as[(String, String, Boolean, Long)].collect()
      .groupBy(_._1).map { case (h, rs) =>
        h -> rs.map(r => (r._2, r._3, r._4)).toSet }
    files.foreach { case (h, content) =>
      val want = localRules(content, "googlebot")
      assert(got.getOrElse(h, Set.empty) == want,
             s"$h:\n$content\ngot ${got.getOrElse(h, Set.empty)} want $want")
    }
  }

  test("property: substring-dedup pairs/survivors match a brute-force model") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new Random(77)
    val vocab = (0 until 30).map(i => s"v$i")
    val docTexts = scala.collection.mutable.ArrayBuffer.empty[String]
    (0L until 40L).foreach { i =>
      // overlapping texts: some docs copy a run from an earlier doc
      val base = Seq.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
      val text =
        if (i > 5 && rnd.nextInt(3) == 0) {
          val donor = docTexts(rnd.nextInt(i.toInt))
          (base.take(3) ++ donor.split(" ").take(10) ++ base.drop(3)).mkString(" ")
        } else base.mkString(" ")
      docTexts += text
    }
    val docs = docTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toSeq
    val df = docs.toDF("doc_id", "text")
    val w = 8
    def windows(t: String): Set[Seq[String]] = {
      val toks = t.trim.split("\\s+").toSeq
      if (toks.length < w) Set.empty else toks.sliding(w).map(_.toSeq).toSet
    }
    val model = docs.map { case (id, t) => id -> windows(t) }.toMap
    val wantPairs = (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      n = (model(a) intersect model(b)).size if n >= 1
    } yield (a, b, n.toLong)).toSet
    val gotPairs = graft.operators.SubstringDedup.sharedPairs(df, w,
        maxBucket = 1000)
      .as[(Long, Long, Long)].collect().toSet
    assert(gotPairs == wantPairs)
    val wantKept = docs.map(_._1).filter { id =>
      !docs.exists { case (o, _) => o < id && (model(o) intersect model(id)).nonEmpty }
    }.toSet
    val gotKept = graft.operators.SubstringDedup.survivors(df, w)
      .select("doc_id").as[Long].collect().toSet
    assert(gotKept == wantKept)
  }

  test("property: mime sniffing total (never throws) and simplify closed") {
    val rnd = new Random(99)
    (1 to 200).foreach { _ =>
      val bs = Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      val m  = graft.functions.Mimes.sniff(bs)
      assert(m != null && m.contains("/"))
      val s = graft.functions.Mimes.simplify(m)
      assert(s == null || s == "txt" || s == "html")
    }
  }
}
