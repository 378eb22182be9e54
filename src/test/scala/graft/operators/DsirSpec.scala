package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** DSIR weights against an independent scalar reimplementation (java
  * MessageDigest md5 → hex-prefix bucket, BigDecimal rounding), plus
  * the semantic property the operator exists for: target-like docs
  * weigh higher.
  */
class DsirSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private val B = 1024

  private def bucketRef(g: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
    hex.take(6).foldLeft(0L)((acc, c) =>
      acc * 16 + Character.digit(c, 16)) % B
  }

  private def featsRef(text: String): Seq[Long] = {
    val t = text.trim.toLowerCase.split("\\s+").toSeq
    val bi = t.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
    (t ++ bi).map(bucketRef)
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("weights match the scalar model bit-for-bit") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "alpha beta alpha", true),
      (2L, "gamma delta epsilon", false),
      (3L, "alpha beta gamma", false),
      (4L, "zeta eta theta iota", false))
    val df = rows.toDF("doc_id", "text", "__t")
    val m = Dsir.train(df, "__t", buckets = B)
    val got = Dsir.weigh(df, m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

    // scalar replay: bucket counts over raw (all) and target docs
    val all = rows.flatMap { case (_, t, tgt) =>
      featsRef(t).map(_ -> tgt) }
    val cRaw = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cTgt = all.filter(_._2).groupBy(_._1).view
      .mapValues(_.size.toLong).toMap
    val (tRaw, tTgt) = (all.size.toLong, all.count(_._2).toLong)
    def lpMu(c: Long, t: Long): Long =
      math.round(r6(math.log10((c + 1.0) / (t.toDouble + B))) * 1e6)
    for ((id, text, _) <- rows) {
      val fs = featsRef(text)
      val w = fs.map(b => math.round(
        (r6(math.log10((cTgt.getOrElse(b, 0L) + 1.0) / (tTgt.toDouble + B)))
          - r6(math.log10((cRaw.getOrElse(b, 0L) + 1.0)
            / (tRaw.toDouble + B)))) * 1e6)).sum
      val want = BigDecimal(w / 1e6)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id)._1 == fs.size.toLong, s"doc $id n_feats")
      assert(got(id)._2 == want, s"doc $id llw: ${got(id)._2} vs $want")
    }
    // the doc sharing grams with the target outweighs the disjoint one
    assert(got(3L)._2 > got(2L)._2)
    lpMu(0L, 0L) // keep the helper referenced for future cases
  }

  test("bucketCol stays in range and agrees with the scalar hash") {
    val s = spark
    import s.implicits._
    val grams = Seq("a", "bb", "alpha beta", "xyz", "").toDF("g")
    val got = grams.select(Dsir.bucketCol(org.apache.spark.sql
        .functions.col("g"), B).as("b"), org.apache.spark.sql
        .functions.col("g"))
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    for ((g, b) <- got) {
      assert(b >= 0 && b < B)
      assert(b == bucketRef(g), s"gram '$g'")
    }
  }
}
