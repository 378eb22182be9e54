package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Exactness of the two-regime set-similarity join against a brute-force
  * all-pairs reference — including the large-set prefix regime and pairs
  * straddling the regime boundary, which the driver's small-vocabulary
  * tables never exercise.
  */
class SetSimilaritySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private val T = 0.95

  /** Deterministic word pool. */
  private def w(i: Int) = f"w$i%04d"

  /** Brute-force qualifying pairs (the semantics oracle). */
  private def bruteForce(sets: Seq[(String, String, Set[String])])
      : Set[(String, String)] = {
    (for {
      a <- sets; b <- sets
      if a._2 == b._2 && a._1 < b._1
      i = (a._3 & b._3).size
      u = (a._3 | b._3).size
      if u > 0 &&
        BigDecimal(i.toDouble / u).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble >= T
    } yield (a._1, b._1)).toSet
  }

  private def run(sets: Seq[(String, String, Set[String])])
      : Set[(String, String)] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = sets.map { case (id, blk, ws) =>
      (id, blk, ws.toSeq.sorted, ws.size.toLong)
    }.toDF("doc_id", "source", "ws", "c")
    SetSimilarity.jaccardSelfJoin(df, T)
      .select("a_id", "b_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
  }

  test("small regime: identical, one-extra-word, and disjoint sets") {
    val base = (1 to 20).map(w).toSet // n=20: subset pairs need n>=19 for J>=.95
    val sets = Seq(
      ("a", "s", base),
      ("b", "s", base),                     // identical -> pair
      ("c", "s", base + w(99)),             // superset by one: 20/21 = .9524 -> pair
      ("d", "s", (1 to 19).map(w).toSet),   // subset by one: 19/20 = .95 -> pair
      ("e", "s", (100 to 119).map(w).toSet) // disjoint -> no
    )
    val got = run(sets)
    assert(got == bruteForce(sets))
    assert(got.contains(("a", "b")) && got.contains(("a", "d")) &&
           got.contains(("a", "c")))
    assert(!got.contains(("c", "d")) && !got.exists(p => p._1 == "e" || p._2 == "e"))
  }

  test("large regime: prefix filter finds near-identical 60-word sets") {
    val base = (1 to 60).map(w).toSet
    val sets = Seq(
      ("a", "s", base),
      ("b", "s", base - w(60) + w(200)),    // swap 1 of 60: 59/61 < .95 -> no
      ("c", "s", base),                     // identical -> pair
      ("d", "s", base - w(1)),              // subset by one: 59/60 >= .95? 0.9833 -> pair
      ("e", "s", (300 to 359).map(w).toSet) // disjoint
    )
    val got = run(sets)
    assert(got == bruteForce(sets))
    assert(got.contains(("a", "c")) && got.contains(("a", "d")))
  }

  test("boundary-straddling pair (39 vs 41 words) is found") {
    val small = (1 to 39).map(w).toSet
    val large = small ++ Set(w(40), w(41))  // 41 words; 39/41 = 0.9512 -> pair
    val sets = Seq(("a", "s", small), ("b", "s", large))
    assert(run(sets) == bruteForce(sets))
    assert(run(sets) == Set(("a", "b")))
  }

  test("blocking: identical sets in different blocks never pair") {
    val base = (1 to 25).map(w).toSet
    val sets = Seq(("a", "s1", base), ("b", "s2", base))
    assert(run(sets).isEmpty)
  }

  test("randomized cross-check vs brute force") {
    // deterministic pseudo-random family around shared cores; mixes
    // sizes on both sides of the regime boundary
    val sets = (0 until 60).map { i =>
      val size = 10 + (i * 7) % 70
      val core = (1 to size).map(w).toSet
      val mutated =
        if (i % 3 == 0) core
        else if (i % 3 == 1) core - w(1 + i % size)
        else core + w(500 + i)
      (f"d$i%03d", s"s${i % 2}", mutated)
    }
    assert(run(sets) == bruteForce(sets))
  }

  // ---- containment join ----

  private val CT = 0.8

  private def bruteContain(sets: Seq[(String, String, Set[String])])
      : Set[(String, String)] =
    (for {
      a <- sets; b <- sets
      if a._2 == b._2 && a._1 != b._1
      i = (a._3 & b._3).size
      if a._3.nonEmpty && i.toDouble / a._3.size >= CT
    } yield (a._1, b._1)).toSet

  private def runContain(sets: Seq[(String, String, Set[String])])
      : Set[(String, String)] = {
    import spark.implicits._
    val df = sets.map { case (id, blk, ws) =>
      (id, blk, ws.toSeq.sorted, ws.size.toLong)
    }.toDF("doc_id", "source", "ws", "c")
    SetSimilarity.containmentJoin(df, CT)
      .select("a_id", "b_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
  }

  test("containment: an excerpt inside a much larger doc is found " +
       "(the pair symmetric Jaccard misses)") {
    val big = (1 to 100).map(w).toSet
    val excerpt = (1 to 9).map(w).toSet + w(999) // 9/10 = 0.9 in big
    val sets = Seq(("big", "s", big), ("ex", "s", excerpt))
    val got = runContain(sets)
    assert(got.contains(("ex", "big")))
    assert(!got.contains(("big", "ex")), "containment is directional")
    // Jaccard of the same pair is 9/101 — hopeless for a symmetric join
    assert(run(sets).isEmpty)
  }

  test("containment: prefix filter is lossless vs brute force") {
    val sets = (0 until 80).map { i =>
      val size = 5 + (i * 11) % 60
      val off = (i * 3) % 20
      val core = (off until off + size).map(w).toSet
      val mutated =
        if (i % 4 == 0) core
        else if (i % 4 == 1) core + w(700 + i)
        else if (i % 4 == 2) core.take(math.max(1, size * 4 / 5))
        else core - w(off) + w(800 + i)
      (f"d$i%03d", s"s${i % 2}", mutated)
    }
    assert(runContain(sets) == bruteContain(sets))
  }

  test("jaroWinkler: textbook vectors, boost threshold, empty-string " +
      "convention") {
    def jw(a: String, b: String) = SetSimilarity.jaroWinkler(a, b)
    assert(math.abs(jw("martha", "marhta") - 0.9611111111) < 1e-9)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333) < 1e-9)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < 1e-9)
    // no shared prefix -> boost is a no-op
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8962962963) < 1e-9)
    assert(math.abs(jw("crate", "trace") - 0.7333333333) < 1e-9)
    // prefix cap at 4
    assert(math.abs(jw("aaaa", "aaaab") - 0.96) < 1e-9)
    assert(math.abs(jw("prefix", "prefixxxxx") - 0.92) < 1e-9)
    // below the 0.7 boost threshold the prefix must NOT help
    assert(math.abs(jw("abqqqq", "abzzzzzzzz") - 0.5111111111) < 1e-9)
    // window 0 -> transposed bigram has no matches at all
    assert(jw("ab", "ba") == 0.0)
    // DuckDB's empty-string convention (incl. both-empty)
    assert(jw("", "abc") == 0.0 && jw("", "") == 0.0)
    assert(jw("abc", "abc") == 1.0)
  }

  test("jaroWinklerPairs: blocked linkage keeps only close variants") {
    val s = TestSpark.spark
    import s.implicits._
    val df = Seq(
      (1L, "smith john", "b"), (2L, "smith jhon", "b"),
      (3L, "smyth john", "b"), (4L, "completely different", "b"),
      (5L, "smith john", "other")).toDF("id", "s", "blk")
    val out = SetSimilarity.jaroWinklerPairs(df, "id", "s", "blk",
        minSim = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(out.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(out.values.forall(v => v >= 0.9 && v <= 1.0))
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("editNearDupPairs: in-block pairs at classic Levenshtein, " +
      "threshold and blocking respected") {
    val s = TestSpark.spark
    import s.implicits._
    val df = Seq(
      (1L, "kitten", "k"), (2L, "sitting", "k"), (3L, "kitchen", "k"),
      (4L, "mitten", "k"),
      // same string, different block: never paired
      (5L, "kitten", "x"), (6L, "kitten", "x2")).toDF("id", "s", "blk")
    val out = SetSimilarity.editNearDupPairs(df, "id", "s", "blk",
        maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // classic distances: kitten-sitting 3, kitten-kitchen 2,
    // kitten-mitten 1, sitting-kitchen 5 (out), sitting-mitten 3,
    // kitchen-mitten 3
    assert(out == Map((1L, 2L) -> 3L, (1L, 3L) -> 2L, (1L, 4L) -> 1L,
      (2L, 4L) -> 3L, (3L, 4L) -> 3L))
    // oversized block fails loudly
    val big = (0L until 50L).map(i => (i, s"s$i", "one"))
      .toDF("id", "s", "blk")
    val e = intercept[IllegalArgumentException] {
      SetSimilarity.editNearDupPairs(big, "id", "s", "blk", 1,
        maxBucket = 10L).count()
    }
    assert(e.getMessage.contains("maxBucket"))
  }
}
