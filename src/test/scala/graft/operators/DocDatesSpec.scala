package graft.operators

import java.time.LocalDate

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class DocDatesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dates(texts: String*) =
    Curation.extractDates(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("epoch days agree with java.time across eras and leap rules") {
    val samples = Seq("1970-01-01", "2000-02-29", "1999-12-31",
      "2024-02-29", "1600-03-01", "9999-12-31", "2023-05-17")
    val m = dates(samples.map(d => s"on $d end"): _*)
    samples.zipWithIndex.foreach { case (d, i) =>
      val want = LocalDate.parse(d).toEpochDay
      assert(m(i.toLong) == ((1L, want, want)), s"$d -> ${m(i.toLong)}")
    }
  }

  test("invalid calendar dates are rejected by the range rules") {
    val m = dates(
      "2023-13-01 bad month", "2023-00-10 zero month",
      "2023-04-31 short month", "2100-02-29 century non-leap",
      "2025-02-29 non-leap", "1599-05-05 out of era")
    m.values.foreach(v => assert(v == ((0L, -1L, -1L)), v.toString))
  }

  test("multiple dates: count, first and last") {
    val m = dates("a 2020-01-02 b 2018-06-30 c 2022-11-11")
    val want = (3L, LocalDate.parse("2018-06-30").toEpochDay,
      LocalDate.parse("2022-11-11").toEpochDay)
    assert(m(0L) == want)
  }

  test("dateless docs are retained with the -1 sentinel") {
    val m = dates("no dates at all")
    assert(m(0L) == ((0L, -1L, -1L)))
  }
}
