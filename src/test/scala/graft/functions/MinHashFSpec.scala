package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The Mersenne-fold reduction must equal plain `% (2^31-1)` over the
  * whole domain the permutation chain feeds it: shingle hashes
  * (< 2^53) and a*hp+b (< 2^62). The DuckDB oracles check the same
  * equivalence end-to-end (they evaluate the %-form in BIGINT); this
  * pins the kernel directly, edge values included.
  */
class MinHashFSpec extends AnyFunSuite {

  private val P = (1L << 31) - 1

  test("modP == % over edges and random values up to 2^62") {
    val edges = Seq(0L, 1L, P - 1, P, P + 1, 1L << 31, (1L << 31) + 1,
      2 * P, 2 * P + 1, (1L << 53) - 1, (1L << 62) - 1,
      (P - 1) * (P - 1) + (P - 1)) // max a*hp+b
    edges.foreach { x =>
      assert(MinHashF.modP(x) == x % P, s"x=$x")
    }
    val rnd = new scala.util.Random(7)
    (1 to 100000).foreach { _ =>
      val x = rnd.nextLong() & ((1L << 62) - 1)
      assert(MinHashF.modP(x) == x % P, s"x=$x")
    }
  }
}
