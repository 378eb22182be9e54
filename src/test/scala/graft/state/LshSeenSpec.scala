package graft.state

import java.nio.file.Files

import graft.TestSpark
import graft.operators.LshDedup
import org.scalatest.funsuite.AnyFunSuite

/** Seen band-table lifecycle (scripts/lsh.py:331–381 cumulative
  * cross-dedup state): segment growth, compaction equivalence, dump
  * retirement.
  */
class LshSeenSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("lshseen").toString

  // docs as (doc_id, ord, bands) — bands chosen by hand so collisions
  // are exact and readable
  private def mh(rows: (String, Long, Seq[Long])*) =
    rows.toDF("doc_id", "ord", "bands")

  test("append + compact: reader equivalence, one live segment after") {
    val table = tmp()
    LshSeen.append(spark, table, mh(("a", 0L, Seq(10L, 11L))), "d0")
    LshSeen.append(spark, table, mh(("b", 1L, Seq(11L, 12L))), "d1")
    assert(LshSeen.liveSegments(table).size == 2)
    val before = LshSeen.seenBands(spark, table)
      .as[(Int, Long)].collect().toSet
    // (band,bhash): band index is the position in the array
    assert(before == Set((0, 10L), (1, 11L), (0, 11L), (1, 12L)))

    val m = LshSeen.compact(spark, table)
    assert(LshSeen.liveSegments(table).size == 1)
    assert(m.metrics("n_segments_live") == 1L)
    assert(m.metrics("n_bands") == 4L)
    val after = LshSeen.seenBands(spark, table)
      .as[(Int, Long)].collect().toSet
    assert(after == before)
    // appended segments keep counting from the compacted base
    LshSeen.append(spark, table, mh(("c", 2L, Seq(30L, 31L))), "d2")
    assert(LshSeen.liveSegments(table).size == 2)
    assert(Snapshots.latest(table).get.metrics("n_rows_live") == 6L)
  }

  test("growth metrics: per-segment n_bands and live fan-in") {
    val table = tmp()
    val m0 = LshSeen.append(spark, table, mh(("a", 0L, Seq(1L, 2L))), "d0")
    assert(m0.metrics("n_bands") == 2L)
    assert(m0.metrics("n_rows_live") == 2L)
    assert(m0.metrics("n_segments_live") == 1L)
    // within-dump duplicates collapse in the segment itself
    val m1 = LshSeen.append(spark, table,
      mh(("b", 1L, Seq(1L, 2L)), ("c", 2L, Seq(1L, 2L))), "d1")
    assert(m1.metrics("n_bands") == 2L)
    assert(m1.metrics("n_rows_live") == 4L)
    assert(m1.metrics("n_segments_live") == 2L)
  }

  test("retire drops dump-old bands but keeps re-seen ones (max dump_ord)") {
    val table = tmp()
    // dump 0: bands (0,100) and (1,101); dump 1: re-sees (0,100) only;
    // dump 2: band (1,300)
    LshSeen.append(spark, table, mh(("a", 0L, Seq(100L, 101L))), "d0")
    LshSeen.append(spark, table, mh(("b", 1L, Seq(100L, 999L))), "d1")
    LshSeen.append(spark, table, mh(("c", 2L, Seq(555L, 300L))), "d2")
    // retire everything whose LATEST occurrence is before snapshot 1
    val m = LshSeen.retire(spark, table, minDumpOrd = 1L)
    assert(m.lineage.startsWith("lsh-seen rebase retire"))
    assert(LshSeen.liveSegments(table).size == 1)
    val left = LshSeen.seenBands(spark, table)
      .as[(Int, Long)].collect().toSet
    // (1,101) was only in dump 0 -> gone; (0,100) re-seen in dump 1 ->
    // kept; dump 1/2's own bands kept
    assert(left == Set((0, 100L), (1, 999L), (0, 555L), (1, 300L)))
  }

  test("crossDedupBands over the store == crossDedup over packed seen") {
    val table = tmp()
    val seen1 = mh(("s1", 0L, Seq(10L, 20L)), ("s2", 1L, Seq(30L, 40L)))
    val seen2 = mh(("s3", 2L, Seq(50L, 60L)))
    LshSeen.append(spark, table, seen1, "d0")
    LshSeen.append(spark, table, seen2, "d1")
    LshSeen.compact(spark, table)
    val fresh = mh(
      ("n1", 10L, Seq(10L, 99L)),  // band-0 collision with s1 -> dropped
      ("n2", 11L, Seq(99L, 60L)),  // band-1 collision with s3 -> dropped
      ("n3", 12L, Seq(20L, 30L)),  // values seen only at OTHER band idx -> kept
      ("n4", 13L, Seq(98L, 97L)))  // no collision -> kept
    val viaStore = LshDedup.crossDedupBands(fresh,
      LshSeen.seenBands(spark, table))
      .select("doc_id").as[String].collect().toSet
    val viaPacked = LshDedup.crossDedup(fresh, seen1.unionByName(seen2))
      .select("doc_id").as[String].collect().toSet
    assert(viaStore == Set("n3", "n4"))
    assert(viaStore == viaPacked)
  }
}
