package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multi-pattern blocklist matching via a broadcast Aho–Corasick
  * automaton — the UT1/adult-phrase-list gate crawl pipelines run over
  * every page (the reference family's filter stage keeps such lists
  * beside its boilerplate/language filters; cf. filter_corpus.py's
  * per-page gates). One linear scan matches ALL patterns at once:
  * O(chars + matches) per doc regardless of list size, where the naive
  * per-pattern contains() is O(chars × patterns) — the difference
  * between feasible and not at a 10k-phrase list × 100 TB.
  *
  * Design note: the automaton is genuinely per-partition imperative
  * state (goto/fail/output arrays), so this is the documented UDF
  * case — the pattern list is model-scale, compiled once on the
  * driver and shipped in the task closure; the corpus side stays one
  * narrow projection, no shuffle, no explode.
  *
  * Matching is case-insensitive (text lowercased, patterns lowercased
  * at compile) and counts EVERY occurrence, overlapping included —
  * one count per (pattern, end-position) pair, the classical AC
  * output semantics. Word boundaries are the caller's encoding
  * concern (include spaces in the pattern).
  */
object Blocklist {

  /** Immutable compiled automaton. States are dense ints; transitions
    * are per-state sorted char arrays (binary-searched) — compact and
    * allocation-free at match time.
    */
  final class Automaton private[Blocklist] (
      val chars: Array[Array[Char]],   // sorted edge labels per state
      val next: Array[Array[Int]],     // target states, parallel to chars
      val fail: Array[Int],            // failure links
      val outs: Array[Array[Int]],     // pattern ids ending at state
      val patterns: Array[String]) extends Serializable {

    private def step(s0: Int, c: Char): Int = {
      var s = s0
      while (true) {
        val i = java.util.Arrays.binarySearch(chars(s), c)
        if (i >= 0) return next(s)(i)
        if (s == 0) return 0
        s = fail(s)
      }
      0 // unreachable
    }

    /** (total hits, distinct patterns hit, first match start 1-based
      * or 0, first matching pattern id or -1). "First" = smallest
      * start position, ties to the smallest pattern id.
      */
    def scan(text: String): (Long, Long, Long, Int) = {
      if (text == null) return (0L, 0L, 0L, -1)
      val t = text.toLowerCase(java.util.Locale.ROOT)
      var s = 0
      var hits = 0L
      val seen = new java.util.BitSet(patterns.length)
      var firstStart = Long.MaxValue
      var firstPat = -1
      var i = 0
      while (i < t.length) {
        s = step(s, t.charAt(i))
        val os = outs(s)
        var j = 0
        while (j < os.length) {
          val p = os(j)
          hits += 1
          seen.set(p)
          val start = i + 2L - patterns(p).length // 1-based
          if (start < firstStart ||
              (start == firstStart && (firstPat < 0 || p < firstPat))) {
            firstStart = start
            firstPat = p
          }
          j += 1
        }
        i += 1
      }
      (hits, seen.cardinality().toLong,
        if (firstPat < 0) 0L else firstStart, firstPat)
    }
  }

  /** Classic trie + BFS failure-link construction. Patterns are
    * lowercased and deduped; empty patterns rejected.
    */
  def compile(patterns0: Seq[String]): Automaton = {
    val patterns = patterns0.map(_.toLowerCase(java.util.Locale.ROOT))
      .distinct.toArray
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "blocklist needs non-empty patterns")
    val goto = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeMap.empty[Char, Int])
    val out = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      p.foreach { c =>
        s = goto(s).getOrElse(c, {
          goto += scala.collection.mutable.TreeMap.empty[Char, Int]
          out += scala.collection.mutable.ArrayBuffer.empty[Int]
          goto(s)(c) = goto.length - 1
          goto.length - 1
        })
      }
      out(s) += pid
    }
    val n = goto.length
    val fail = new Array[Int](n)
    val q = scala.collection.mutable.Queue.empty[Int]
    goto(0).values.foreach { s => fail(s) = 0; q += s }
    while (q.nonEmpty) {
      val u = q.dequeue()
      goto(u).foreach { case (c, v) =>
        q += v
        var f = fail(u)
        while (f != 0 && !goto(f).contains(c)) f = fail(f)
        fail(v) = goto(f).get(c).filter(_ != v).getOrElse(0)
        out(v) ++= out(fail(v))
      }
    }
    new Automaton(
      goto.map(_.keys.toArray).toArray,
      goto.map(_.values.toArray).toArray,
      fail,
      out.map(_.sorted.toArray).toArray,
      patterns)
  }

  /** Per-doc blocklist report: total (overlapping) hits, distinct
    * patterns hit, first match position (1-based char, 0 = none) and
    * pattern, and the `drop_doc` verdict at `maxHits` total hits.
    */
  def matchReport(df: DataFrame, textCol: String, patterns: Seq[String],
                  maxHits: Int = 3): DataFrame = {
    val ac = compile(patterns)
    val scanUdf = udf((s: String) => {
      val (h, np, fp, pid) = ac.scan(s)
      (h, np, fp, if (pid < 0) "" else ac.patterns(pid))
    })
    df.withColumn("__r", scanUdf(col(textCol)))
      .withColumn("n_hits", col("__r._1").cast(LongType))
      .withColumn("n_patterns", col("__r._2").cast(LongType))
      .withColumn("first_pos", col("__r._3").cast(LongType))
      .withColumn("first_pattern", col("__r._4"))
      .withColumn("drop_doc", col("n_hits") >= maxHits)
      .drop("__r")
  }
}
