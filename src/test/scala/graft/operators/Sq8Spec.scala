package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class Sq8Spec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact grid endpoints and midpoint code as expected") {
    // dim 0 spans [0, 1]; dim 1 constant
    val df = Seq(
      (0L, Array(0.0f, 7.0f)),
      (1L, Array(0.5f, 7.0f)),
      (2L, Array(1.0f, 7.0f))).toDF("vec_id", "embedding")
    val got = Similarity.sq8Quantize(df).orderBy("vec_id").collect()
    assert(got(0).getSeq[Int](1) == Seq(0, 0))
    // 0.5*255 = 127.5 -> floor(127.5+0.5) = 128
    assert(got(1).getSeq[Int](1) == Seq(128, 0))
    assert(got(2).getSeq[Int](1) == Seq(255, 0))
    // constant dim reconstructs exactly; endpoint codes reconstruct
    // exactly too -> zero error for rows 0 and 2
    assert(got(0).getLong(2) == 0L)
    assert(got(2).getLong(2) == 0L)
    // midpoint: recon = 128/255 = 0.501961 (6dp), err = (0.5-0.501961)^2
    val expMid = math.round(math.pow(0.5 - 0.501961, 2) * 1e8)
    assert(got(1).getLong(2) == expMid, s"got ${got(1).getLong(2)}")
  }

  test("reconstruction error bounded by half-step per dimension") {
    val rnd = new scala.util.Random(7)
    val dim = 8
    val df = (0 until 50).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 4 - 2))
    }.toDF("vec_id", "embedding")
    val spans = df
      .select(org.apache.spark.sql.functions.posexplode(
        org.apache.spark.sql.functions.col("embedding").cast("array<double>"))
        .as(Seq("i", "x")))
      .groupBy("i")
      .agg(org.apache.spark.sql.functions.expr("max(x) - min(x)").as("sp"))
      .collect().map(_.getDouble(1))
    // per-dim worst-case err: (half grid step + 6dp rounding slack)^2
    val bound = spans.map { sp =>
      val half = sp / 255.0 / 2 + 1e-6
      half * half * 1e8
    }.sum + dim
    Similarity.sq8Quantize(df).collect().foreach { r =>
      assert(r.getLong(2) <= bound.toLong + 1,
        s"err ${r.getLong(2)} > bound $bound")
    }
  }
}
