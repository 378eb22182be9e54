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
