package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class TableOpsSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  test("mergeUpsert: U replaces, D removes, I adds, untouched survive") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (2L, "B", "U"),  // update
      (3L, "x", "D"),  // delete (payload ignored)
      (9L, "i", "I")   // insert
    ).toDF("k", "v", "op")
    val got = TableOps.mergeUpsert(base, changes, "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "B", 9L -> "i"))
  }

  test("compactionPlan: crossing file ships with its bin; dirs independent") {
    val s = spark
    import s.implicits._
    // dir A sizes 40,40,40 at target 100: cum-before 0,40,80 -> bins 0,0,0
    // then 60: cum-before 120 -> bin 1 (the 80-cum file crossed and shipped)
    val files = Seq(
      ("A", 1L, 40L), ("A", 2L, 40L), ("A", 3L, 40L), ("A", 4L, 60L),
      ("B", 1L, 250L), ("B", 2L, 10L)
    ).toDF("dir", "file_id", "size")
    val got = TableOps.compactionPlan(files, targetBytes = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
      .toMap
    assert(got(("A", 1L)) == 0L && got(("A", 2L)) == 0L)
    assert(got(("A", 3L)) == 0L, "crossing file must ship with bin 0")
    assert(got(("A", 4L)) == 1L)
    assert(got(("B", 1L)) == 0L)
    assert(got(("B", 2L)) == 2L, "oversized first file pushes cum past 2 bins")
  }

  test("rendezvousAssign: minimal movement, moved keys land on the " +
       "added node, balance is sane") {
    val s = spark
    import s.implicits._
    val keys = (0L until 2000L).toDF("k")
    val n5 = (0 until 5).map(i => s"n$i")
    val a5 = TableOps.rendezvousAssign(keys, "k", n5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a6 = TableOps.rendezvousAssign(keys, "k", n5 :+ "n5")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val moved = a5.keys.filter(k => a5(k) != a6(k)).toSeq
    // the HRW property: a key moves ONLY to the newly added node
    moved.foreach(k => assert(a6(k) == "n5", s"key $k moved to ${a6(k)}"))
    // expected 1/6 of keys move; allow generous slack
    assert(moved.size > 2000 / 12 && moved.size < 2000 / 3)
    // balance: each of the 5 nodes holds a sane share
    val byNode = a5.values.groupBy(identity).view.mapValues(_.size)
    assert(byNode.size == 5 && byNode.values.forall(n => n > 200 && n < 600))
  }

  test("scd2Intervals: exclusive valid_to chain, single current per key") {
    val s = spark
    import s.implicits._
    val log = Seq(
      (1L, 10L, "v1"), (1L, 20L, "v2"), (1L, 30L, "v3"),
      (2L, 15L, "w1")
    ).toDF("k", "ts", "v")
    val rows = TableOps.scd2Intervals(log, "k", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5)))
      .toMap
    assert(rows((1L, 10L)) == (Some(20L), false))
    assert(rows((1L, 20L)) == (Some(30L), false))
    assert(rows((1L, 30L)) == (None, true))
    assert(rows((2L, 15L)) == (None, true))
  }

  test("retentionPlan: recency set, day anchors, label precedence") {
    val s = spark
    import s.implicits._
    val day = 86400L
    // day 0: snaps at 0, 100, 200; day 1: at day+5; day 2: three snaps
    val snaps = Seq(
      (1L, 0L), (2L, 100L), (3L, 200L),
      (4L, day + 5),
      (5L, 2 * day), (6L, 2 * day + 50), (7L, 2 * day + 60))
      .toDF("snap_id", "epoch")
    val out = TableOps.retentionPlan(snaps, "snap_id", "epoch",
        keepLast = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), r.getString(3)))).toMap
    // recent = 7, 6, 5 (epoch desc, id desc)
    assert(out(7L) == ((true, "recent")))
    assert(out(6L) == ((true, "recent")))
    // 5 is both recent and day-2 anchor: recent label wins
    assert(out(5L) == ((true, "recent")))
    assert(out(4L) == ((true, "day_anchor")))
    assert(out(1L) == ((true, "day_anchor")))
    assert(out(2L) == ((false, "expired")))
    assert(out(3L) == ((false, "expired")))
  }
}
