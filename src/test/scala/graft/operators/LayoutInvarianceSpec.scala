package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Partition-layout invariance for the integer-exact operators added in
  * round 6: their contracts promise addition-order-insensitive (Long)
  * arithmetic, so the SAME input under different partitionings must
  * produce IDENTICAL rows — not merely statistically equal. A float
  * reduction hiding anywhere in these paths would eventually flip a
  * rounding boundary under re-layout; this spec would catch it.
  */
class LayoutInvarianceSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("HostRank.pageRank is identical under 1, 7, and 32 partitions") {
    val s = spark
    import s.implicits._
    val rnd = new Random(7)
    val edges = Seq.fill(3000)((rnd.nextInt(100).toLong,
      rnd.nextInt(100).toLong)).toDF("src", "dst")
    val nodes = (0L until 100L).toDF("host")
    val base = rows(HostRank.pageRank(edges.repartition(1), nodes,
      iters = 4, scale = 1000000000L))
    for (p <- Seq(7, 32)) {
      assert(rows(HostRank.pageRank(edges.repartition(p), nodes,
        iters = 4, scale = 1000000000L)) == base, s"p=$p")
    }
  }

  test("Dsir weights are identical under re-layout") {
    val s = spark
    import s.implicits._
    val rnd = new Random(11)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docs = (1L to 200L).map { id =>
      val t = Seq.fill(10)(words(rnd.nextInt(words.size))).mkString(" ")
      (id, t, id % 5 == 0)
    }.toDF("doc_id", "text", "__t")
    val m1 = Dsir.train(docs.repartition(1), "__t", buckets = 64)
    val base = rows(Dsir.weigh(docs.repartition(1), m1))
    val m2 = Dsir.train(docs.repartition(13), "__t", buckets = 64)
    assert(rows(Dsir.weigh(docs.repartition(13), m2)) == base)
  }

  test("refreshSchedule is identical under re-layout and input order") {
    val s = spark
    import s.implicits._
    val rnd = new Random(23)
    val fetches = rnd.shuffle((1 to 500).map { i =>
      (s"u${i % 40}", (i * 37 % 1000).toLong, (i % 3).toLong)
    }).toDF("url", "fetch_epoch", "version")
    val base = rows(CrawlPolicy.refreshSchedule(
      fetches.repartition(1), 1000L, 300L, 4000L))
    assert(rows(CrawlPolicy.refreshSchedule(
      fetches.repartition(17), 1000L, 300L, 4000L)) == base)
  }

  test("QualityClassifier decisions are identical under re-layout") {
    val s = spark
    import s.implicits._
    val rnd = new Random(31)
    val words = Vector("good", "fine", "bad", "ugly", "meh", "ok")
    val docs = (1L to 150L).map { id =>
      (id, Seq.fill(8)(words(rnd.nextInt(words.size))).mkString(" "),
        id % 2 == 0)
    }.toDF("doc_id", "text", "__pos")
    val base = {
      val m = QualityClassifier.train(docs.repartition(1), "__pos")
      rows(QualityClassifier.classify(docs.repartition(1), m))
    }
    val again = {
      val m = QualityClassifier.train(docs.repartition(19), "__pos")
      rows(QualityClassifier.classify(docs.repartition(19), m))
    }
    assert(again == base)
  }
}
