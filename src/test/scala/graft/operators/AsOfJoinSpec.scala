package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  test("asOf: latest-at-or-before per key, ties inclusive, left nulls") {
    val s = spark
    import s.implicits._
    val quotes = Seq(
      ("k1", 10L, 1.0), ("k1", 20L, 2.0), ("k1", 30L, 3.0),
      ("k2", 15L, 9.0)
    ).toDF("k", "t", "qv")
    val trades = Seq(
      (1L, "k1", 5L),   // before any quote -> null
      (2L, "k1", 10L),  // tie: quote AT the probe time matches
      (3L, "k1", 25L),  // between 20 and 30 -> 2.0
      (4L, "k1", 99L),  // after all -> 3.0
      (5L, "k2", 16L),  // k2 must not see k1 quotes
      (6L, "k3", 50L)   // key with no quotes at all -> null
    ).toDF("id", "k", "t")
    val out = AsOfJoin.asOf(trades, quotes, "k", "t", Seq("t", "qv"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
         Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L) == (None, None))
    assert(out(2L) == (Some(10L), Some(1.0)))
    assert(out(3L) == (Some(20L), Some(2.0)))
    assert(out(4L) == (Some(30L), Some(3.0)))
    assert(out(5L) == (Some(15L), Some(9.0)))
    assert(out(6L) == (None, None))
  }

  test("asOf matches a brute-force reference on random data") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3)
    val quotes = (0 until 300).map(i =>
      (s"k${rnd.nextInt(8)}", rnd.nextInt(1000).toLong, i.toDouble))
      .groupBy(q => (q._1, q._2)).map(_._2.maxBy(_._3)).toSeq
    val trades = (0 until 500).map(i =>
      (i.toLong, s"k${rnd.nextInt(10)}", rnd.nextInt(1100).toLong))
    val got = AsOfJoin.asOf(trades.toDF("id", "k", "t"),
        quotes.toDF("k", "t", "qv"), "k", "t", Seq("t", "qv"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
         Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    trades.foreach { case (id, k, t) =>
      val want = quotes.filter(q => q._1 == k && q._2 <= t)
        .sortBy(_._2).lastOption
      assert(got(id) == (want.map(_._2), want.map(_._3)), s"trade $id")
    }
  }
}
