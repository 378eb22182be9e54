package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** MinHash over character n-grams (reference: cc_corpus/deduplication.py
  * :169–184 — 256 permutations, char 5-grams; scripts/minhash.py:42–44).
  *
  * The permutation family is our own (the reference rides on datasketch's
  * SHA1-based family; hash-function identity is not part of the query
  * semantics — parity is defined against our reference interpreter using
  * the same family): h_i(s) = (a_i * fnv64(s) + b_i) mod (2^61-1), with
  * (a_i, b_i) drawn from a fixed splitmix64 stream (seed 42). Empty texts
  * (< n chars) yield the all-MaxValue signature, so empty docs collide
  * with each other — same behavior as an un-updated datasketch MinHash.
  *
  * Band structure for LSH: b bands of r rows (b*r = numPerm), chosen to
  * minimize |(1/b)^(1/r) - threshold| — the standard S-curve midpoint
  * criterion (Mining of Massive Datasets ch. 3).
  */
object MinHashF {

  val NumPerm  = 256
  val ShingleN = 5
  private val Prime = (1L << 61) - 1

  /** Fixed permutation parameters, derived from splitmix64(seed=42). */
  private val (as, bs): (Array[Long], Array[Long]) = {
    val a = new Array[Long](NumPerm)
    val b = new Array[Long](NumPerm)
    var i = 0
    while (i < NumPerm) {
      // a_i must be in [1, p); b_i in [0, p)
      a(i) = java.lang.Long.remainderUnsigned(
        graft.fixtures.CrawlFixtures.mix(1000L + 2L * i), Prime - 1) + 1
      b(i) = java.lang.Long.remainderUnsigned(
        graft.fixtures.CrawlFixtures.mix(2000L + 2L * i + 1), Prime)
      i += 1
    }
    (a, b)
  }

  /** FNV-1a 64-bit over UTF-8 bytes — stable across JVMs. */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** a*h mod 2^61-1 for 0 <= a,h < 2^61: 128-bit product via
    * Math.multiplyHigh, folded in base-2^61 limbs (2^61 ≡ 1 mod p).
    */
  private def mulmodP(a: Long, h: Long): Long = {
    val hi = Math.multiplyHigh(a, h) // product < 2^122, positive
    val lo = a * h
    val c0 = lo & Prime                        // bits 0..60
    val c1 = ((lo >>> 61) | (hi << 3)) & Prime // bits 61..121
    val c2 = hi >>> 58                         // bits 122+
    var r = c0 + c1 + c2                       // < 3 * 2^61, no overflow
    while (r >= Prime) r -= Prime
    r
  }

  /** (a*h0 + b) mod 2^61-1. */
  private def permute(a: Long, b: Long, h0: Long): Long = {
    val h = java.lang.Long.remainderUnsigned(h0, Prime)
    var r = mulmodP(a, h) + b // both < p -> sum < 2^62, no overflow
    if (r >= Prime) r -= Prime
    r
  }

  /** FNV-1a over a window of an ASCII-only string (chars == UTF-8 bytes):
    * allocation-free, value-identical to fnv64(s.substring(from, from+n)).
    */
  private def fnv64AsciiWindow(s: String, from: Int, n: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    val end = from + n
    while (i < end) {
      h ^= (s.charAt(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) >= 0x80) return false
      i += 1
    }
    true
  }

  /** Minimal open-addressed long set (power-of-2 capacity, linear probe).
    * 0 is reserved as the empty marker; the caller remaps it.
    */
  private final class LongSet(expected: Int) {
    private var cap  = Integer.highestOneBit(math.max(expected * 2, 16) - 1) << 1
    private var tab  = new Array[Long](cap)
    private var size = 0
    def add(k0: Long): Boolean = {
      val k = if (k0 == 0L) 0x9e3779b97f4a7c15L else k0 // remap reserved 0
      var i = (java.lang.Long.hashCode(k) * 0x9e3779b9) & (cap - 1)
      while (true) {
        val cur = tab(i)
        if (cur == 0L) {
          tab(i) = k; size += 1
          if (size * 4 > cap * 3) grow()
          return true
        }
        if (cur == k) return false
        i = (i + 1) & (cap - 1)
      }
      false
    }
    private def grow(): Unit = {
      val old = tab
      cap *= 2
      tab = new Array[Long](cap)
      size = 0
      var i = 0
      while (i < old.length) {
        val k = old(i)
        if (k != 0L) {
          var j = (java.lang.Long.hashCode(k) * 0x9e3779b9) & (cap - 1)
          while (tab(j) != 0L) j = (j + 1) & (cap - 1)
          tab(j) = k; size += 1
        }
        i += 1
      }
    }
  }

  /** MinHash signature of `text`: min over all char-n-gram shingles.
    * Hot-path form: ASCII texts hash windows without allocating, and each
    * distinct shingle runs the 256 permutations once (a repeated shingle
    * cannot lower any minimum) — identical output to the naive loop.
    */
  def signature(text: String): Array[Long] = {
    val sig = Array.fill(NumPerm)(Long.MaxValue)
    if (text != null && text.length >= ShingleN) {
      val end   = text.length - ShingleN
      val ascii = isAscii(text)
      val seen  = new LongSet(math.min(end + 1, 1 << 16))
      var i = 0
      while (i <= end) {
        val h0 =
          if (ascii) fnv64AsciiWindow(text, i, ShingleN)
          else fnv64(text.substring(i, i + ShingleN))
        if (seen.add(h0)) {
          var j = 0
          while (j < NumPerm) {
            val v = permute(as(j), bs(j), h0)
            if (v < sig(j)) sig(j) = v
            j += 1
          }
        }
        i += 1
      }
    }
    sig
  }

  /** Hash each of the `b` r-long slices of the signature. */
  def bandHashes(sig: Array[Long], b: Int): Array[Long] = {
    val r   = NumPerm / b
    val out = new Array[Long](b)
    var i = 0
    while (i < b) {
      var h = 0xcbf29ce484222325L
      var j = i * r
      val end = j + r
      while (j < end) {
        h ^= sig(j)
        h *= 0x100000001b3L
        j += 1
      }
      out(i) = h
      i += 1
    }
    out
  }

  /** Number of bands whose S-curve midpoint (1/b)^(1/r) is closest to the
    * threshold, over divisors of numPerm.
    */
  def optimalBands(threshold: Double, numPerm: Int = NumPerm): Int = {
    val candidates = (1 to numPerm).filter(numPerm % _ == 0)
    candidates.minBy { b =>
      val r = numPerm / b
      math.abs(math.pow(1.0 / b, 1.0 / r) - threshold)
    }
  }

  /** True if any band collides between the two signatures — datasketch
    * MinHashLSH.query's candidate criterion (no exact verification).
    */
  def anyBandMatch(a: Array[Long], bSig: Array[Long], b: Int): Boolean = {
    val ha = bandHashes(a, b)
    val hb = bandHashes(bSig, b)
    var i = 0
    while (i < b) {
      if (ha(i) == hb(i)) return true
      i += 1
    }
    false
  }

  /** Estimated Jaccard from two signatures (fraction of equal mins). */
  def estJaccard(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0
    var i = 0
    while (i < NumPerm) {
      if (a(i) == b(i)) eq += 1
      i += 1
    }
    eq.toDouble / NumPerm
  }

  val signatureUdf = udf(signature _)
  def bandsUdf(b: Int) = udf((sig: Array[Long]) => bandHashes(sig, b))

  def signatureCol(text: Column): Column = signatureUdf(text)
}
