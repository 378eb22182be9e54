package graft.state

/** Bucketized cuckoo filter with partial-key cuckoo hashing (Fan et al.,
  * "Cuckoo Filter: Practically Better Than Bloom", CoNEXT'14): 4-slot
  * buckets, 16-bit fingerprints, delete support. This is the exact-pass
  * membership structure of the URL-seen set (SURVEY.md §7.1 item 2): the
  * broadcast bloom filter screens definitely-new URLs cheaply; cuckoo
  * partitions answer the maybe-seen sliver exactly and support frontier
  * retirement (deletes) — which a bloom filter cannot.
  *
  * Deterministic: no randomness; eviction choice derives from an
  * instance counter, so identical insert sequences produce identical
  * serialized state (required for snapshot reproducibility).
  */
final class CuckooFilter private (
    val numBuckets: Int,
    val slotsPerBucket: Int,
    private val table: Array[Short],
    private var count: Long,
    private var kickSeed: Long
) extends Serializable {

  import CuckooFilter._

  def this(numBuckets: Int, slotsPerBucket: Int = 4) =
    this(CuckooFilter.nextPow2(numBuckets), slotsPerBucket,
         new Array[Short](CuckooFilter.nextPow2(numBuckets) * slotsPerBucket),
         0L, 0L)

  private def mask: Int = numBuckets - 1

  private def fingerprint(h: Long): Short = {
    val f = ((h >>> 45) & 0xffff).toInt
    (if (f == 0) 1 else f).toShort
  }

  private def bucket1(h: Long): Int = (h & mask).toInt

  private def altBucket(b: Int, f: Short): Int =
    (b ^ (mix(f & 0xffffL) & mask)).toInt

  private def slotBase(b: Int): Int = b * slotsPerBucket

  private def tryInsertAt(b: Int, f: Short): Boolean = {
    val base = slotBase(b)
    var s = 0
    while (s < slotsPerBucket) {
      if (table(base + s) == 0) { table(base + s) = f; return true }
      s += 1
    }
    false
  }

  private def bucketContains(b: Int, f: Short): Boolean = {
    val base = slotBase(b)
    var s = 0
    while (s < slotsPerBucket) {
      if (table(base + s) == f) return true
      s += 1
    }
    false
  }

  /** Insert a pre-hashed key. Returns false when the filter is full
    * (max kicks exhausted) — caller should have sized for the load.
    */
  def insert(h: Long): Boolean = {
    var f  = fingerprint(h)
    val b1 = bucket1(h)
    val b2 = altBucket(b1, f)
    if (tryInsertAt(b1, f) || tryInsertAt(b2, f)) { count += 1; return true }
    // evict: start from b1/b2 alternating deterministically
    var b = if ((kickSeed & 1L) == 0L) b1 else b2
    var kicks = 0
    while (kicks < MaxKicks) {
      kickSeed += 1
      val slot = (mix(kickSeed) & (slotsPerBucket - 1)).toInt
      val idx  = slotBase(b) + slot
      val victim = table(idx)
      table(idx) = f
      f = victim
      b = altBucket(b, f)
      if (tryInsertAt(b, f)) { count += 1; return true }
      kicks += 1
    }
    false
  }

  /** Exact-membership check (no false negatives; false positives at the
    * fingerprint-collision rate ~ 2*slots/2^16).
    */
  def contains(h: Long): Boolean = {
    val f  = fingerprint(h)
    val b1 = bucket1(h)
    bucketContains(b1, f) || bucketContains(altBucket(b1, f), f)
  }

  /** Delete one copy of the key's fingerprint. Returns whether a slot was
    * cleared (frontier retirement).
    */
  def delete(h: Long): Boolean = {
    val f  = fingerprint(h)
    val b1 = bucket1(h)
    val b2 = altBucket(b1, f)
    var b  = b1
    var round = 0
    while (round < 2) {
      val base = slotBase(b)
      var s = 0
      while (s < slotsPerBucket) {
        if (table(base + s) == f) {
          table(base + s) = 0
          count -= 1
          return true
        }
        s += 1
      }
      b = b2
      round += 1
    }
    false
  }

  def size: Long = count
  def loadFactor: Double = count.toDouble / (numBuckets.toLong * slotsPerBucket)

  /** Deterministic serialization: header + table. */
  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(32 + table.length * 2)
    bb.putInt(Magic).putInt(numBuckets).putInt(slotsPerBucket)
    bb.putLong(count).putLong(kickSeed).putInt(0)
    table.foreach(bb.putShort)
    bb.array()
  }
}

object CuckooFilter {
  private val Magic    = 0x43554b46 // "CUKF"
  private val MaxKicks = 500

  def mix(x0: Long): Long = graft.fixtures.CrawlFixtures.mix(x0)

  def nextPow2(n: Int): Int = {
    var p = 1
    while (p < n) p <<= 1
    math.max(p, 4)
  }

  /** Size for `n` expected keys at ~85% max load. */
  def forCapacity(n: Long, slotsPerBucket: Int = 4): CuckooFilter = {
    val buckets = nextPow2(math.max(4, (n / (slotsPerBucket * 0.85)).toInt + 1))
    new CuckooFilter(buckets, slotsPerBucket)
  }

  def fromBytes(bytes: Array[Byte]): CuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bb.getInt() == Magic, "not a cuckoo filter blob")
    val nb    = bb.getInt()
    val spb   = bb.getInt()
    val count = bb.getLong()
    val seed  = bb.getLong()
    bb.getInt()
    val table = new Array[Short](nb * spb)
    var i = 0
    while (i < table.length) { table(i) = bb.getShort(); i += 1 }
    new CuckooFilter(nb, spb, table, count, seed)
  }
}
