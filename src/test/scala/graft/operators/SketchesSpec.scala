package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  test("bucket and rho match the hand-computed md5 decomposition") {
    val s = spark
    import s.implicits._
    // md5("42") = a1d0c6e83f027327... -> bucket 0xa1 = 161,
    // tail d0c6... starts with d (>= 8) -> rho = 1
    val r = Seq("42").toDF("k")
      .select(Sketches.hllBucketCol(col("k")).as("b"),
              Sketches.hllRhoCol(col("k")).as("rho"))
      .head()
    assert(r.getLong(0) == 161L && r.getLong(1) == 1L)
  }

  test("rho covers multi-nibble leading-zero runs (brute parity vs JVM)") {
    val s = spark
    import s.implicits._
    // reference rho computed from the md5 hex in plain Scala
    def rhoRef(key: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val rest = h.substring(2, 16)
      val z = rest.takeWhile(_ == '0').length
      if (z == 14) 57L
      else {
        val d = Integer.parseInt(rest.charAt(z).toString, 16)
        val lz = if (d >= 8) 0 else if (d >= 4) 1 else if (d >= 2) 2 else 3
        4L * z + lz + 1
      }
    }
    val keys = (0 until 5000).map(_.toString)
    val got = keys.toDF("k")
      .select(col("k"), Sketches.hllRhoCol(col("k")).as("rho"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    keys.foreach(k => assert(got(k) == rhoRef(k), s"key $k"))
    // the run must include rho > 5 cases or the test proves nothing
    assert(got.values.max >= 8L)
  }

  test("estimate is within 10% at 10k distinct keys (m=256)") {
    val s = spark
    import s.implicits._
    val regs = Sketches.hllRegisters(
      (0 until 10000).map(i => s"url-$i").toDF("key"), "key")
    val est = Sketches.hllEstimate(regs).head().getAs[Double]("est")
    assert(math.abs(est - 10000.0) / 10000.0 < 0.10, s"est=$est")
  }

  test("duplicates never move the sketch; merge == sketch of the union") {
    val s = spark
    import s.implicits._
    val a = (0 until 3000).map(i => s"k$i").toDF("key")
    val b = (1500 until 4500).map(i => s"k$i").toDF("key") // overlaps a
    def regSet(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(df, "key").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(regSet(a.union(a)) == regSet(a))
    val merged = Sketches.hllMerge(
      Sketches.hllRegisters(a, "key"), Sketches.hllRegisters(b, "key"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(merged == regSet(a.union(b)))
  }

  test("small cardinalities take the linear-counting branch") {
    val s = spark
    import s.implicits._
    val regs = Sketches.hllRegisters(
      (0 until 20).map(i => s"x$i").toDF("key"), "key")
    val row = Sketches.hllEstimate(regs).head()
    val zeros = row.getAs[Long]("zeros")
    val est = row.getAs[Double]("est")
    assert(zeros >= 236L) // 20 keys occupy at most 20 buckets
    // linear counting: 256 * ln(256/zeros), rounded — close to 20
    assert(est > 10.0 && est < 30.0, s"est=$est")
  }

  test("cms: estimates never undercount; exact when collision-free") {
    val s = spark
    import s.implicits._
    val data = (Seq.fill(40)("alpha") ++ Seq.fill(7)("beta") ++
      Seq("gamma")).toDF("key")
    val sketch = Sketches.cmsBuild(data, "key")
    val est = Sketches.cmsQuery(
      Seq("alpha", "beta", "gamma", "never").toDF("key"), "key", sketch)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("alpha") >= 40L && est("beta") >= 7L && est("gamma") >= 1L)
    // 3 keys in 4x64 cells: verify against the exact per-cell replay
    def cell(j: Int, k: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j:$k".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 2), 16) % 64
    }
    val truth = Map("alpha" -> 40L, "beta" -> 7L, "gamma" -> 1L)
    val expected = Seq("alpha", "beta", "gamma", "never").map { k =>
      k -> (0 until 4).map { j =>
        truth.filter { case (k2, _) => cell(j, k2) == cell(j, k) }
          .values.sum
      }.min
    }.toMap
    assert(est == expected)
  }

  test("cms: merge of two sketches equals the sketch of the union") {
    val s = spark
    import s.implicits._
    val a = (Seq.fill(5)("x") ++ Seq.fill(3)("y")).toDF("key")
    val b = (Seq.fill(2)("y") ++ Seq.fill(9)("z")).toDF("key")
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    val merged = cells(Sketches.cmsMerge(
      Sketches.cmsBuild(a, "key"), Sketches.cmsBuild(b, "key")))
    assert(merged == cells(Sketches.cmsBuild(a.union(b), "key")))
  }

  test("cms: weighted build counts weights, not rows") {
    val s = spark
    import s.implicits._
    val df = Seq(("k1", 10L), ("k1", 5L), ("k2", 2L)).toDF("key", "w")
    val sketch = Sketches.cmsBuild(df, "key", weightCol = Some("w"))
    val est = Sketches.cmsQuery(Seq("k1", "k2").toDF("key"), "key", sketch)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("k1") >= 15L && est("k2") >= 2L)
  }

  test("cms: build scans its input exactly once (explode, not a union)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cms-scan").toString
    (0 until 100).map(i => s"k${i % 9}").toDF("key")
      .write.mode("overwrite").parquet(dir)
    val sketch = Sketches.cmsBuild(s.read.parquet(dir), "key")
    sketch.collect()
    val scans = sketch.queryExecution.executedPlan.collectLeaves()
      .count(_.toString.contains("Scan parquet"))
    assert(scans == 1, s"expected 1 parquet scan, found $scans")
  }

  test("bloom: no false negatives; all-set words (sign bit) read true") {
    val s = spark
    import s.implicits._
    val seen = (0 until 2000).map(i => s"url-$i").toDF("k")
    val words = Sketches.bloomWords(Sketches.bloomBuild(seen, "k"))
    val got = seen
      .select(Sketches.bloomMightContain(col("k"), words).as("m"))
      .collect()
    assert(got.forall(_.getBoolean(0)), "a Bloom filter may never miss")
    // every word -1L: all 64 bit tests go through the sign-bit path the
    // shift/mask arithmetic must survive (x >> p stays negative)
    val allSet = Array.fill(Sketches.BloomBits / 64)(-1L)
    val got2 = seen
      .select(Sketches.bloomMightContain(col("k"), allSet).as("m"))
      .collect()
    assert(got2.forall(_.getBoolean(0)))
  }

  test("bloom seen flags: exact vs the plain anti join, prefilter prunes") {
    val s = spark
    import s.implicits._
    val cand = (0 until 3000).map(i => s"u$i").toDF("k")
    val seenKeys = (0 until 3000 by 3).map(i => s"u$i")
    val out = Sketches.bloomSeenFlags(cand, "k", seenKeys.toDF("k"), "k")
      .collect()
    assert(out.length == 3000)
    val seenSet = seenKeys.toSet
    out.foreach { r =>
      val k = r.getString(0)
      assert(r.getAs[Boolean]("is_new") == !seenSet(k), s"exactness at $k")
      if (seenSet(k)) assert(r.getAs[Boolean]("might_seen"), s"miss at $k")
    }
    // the point of the operator: a real slice of candidates must skip
    // the join entirely (might_seen false => definitely new, map-only)
    assert(out.count(!_.getAs[Boolean]("might_seen")) > 100)
    // and false positives exist at this fill ratio => the maybe-side
    // join path is genuinely exercised too
    assert(out.exists(r =>
      r.getAs[Boolean]("might_seen") && r.getAs[Boolean]("is_new")))
  }

  test("histogram quantiles: hand-computed bins, merge = direct build") {
    val s = spark
    import s.implicits._
    // 10 values in [0,4) -> bin 0; 85 in [4,8) -> bin 1; 5 in [8,12)
    val vals = (Seq.fill(10)(1.0) ++ Seq.fill(85)(5.0) ++ Seq.fill(5)(9.0))
    val df = vals.toDF("value")
    val hist = Sketches.histBuild(df, "value", binWidth = 4.0, nBins = 256)
    val q = Sketches.histQuantiles(hist, Seq(100, 500, 950, 1000), 4.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // thresholds: ceil(100*q/1000) -> 10, 50, 95, 100
    assert(q(100L) == (0L, 4.0))  // cum(bin0)=10 >= 10
    assert(q(500L) == (1L, 8.0))  // cum(bin1)=95 >= 50
    assert(q(950L) == (1L, 8.0))  // 95 >= 95
    assert(q(1000L) == (2L, 12.0))
    // merge associativity: two half-builds sum to the direct build
    val h1 = Sketches.histBuild(vals.take(50).toDF("value"), "value", 4.0, 256)
    val h2 = Sketches.histBuild(vals.drop(50).toDF("value"), "value", 4.0, 256)
    def cells(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cells(Sketches.histMerge(h1, h2)) == cells(hist))
  }

  test("histogram quantile error is bounded by one bin width") {
    val s = spark
    import s.implicits._
    val vals = (0 until 2000).map(i => (i * 37 % 1000) / 10.0) // [0, 100)
    val hist = Sketches.histBuild(vals.toDF("value"), "value", 4.0, 256)
    val qs = Seq(250, 500, 750, 900)
    val est = Sketches.histQuantiles(hist, qs, 4.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      val trueQ = sorted((vals.size * q / 1000 - 1).max(0))
      val e = est(q.toLong)
      assert(e >= trueQ && e - trueQ <= 2 * 4.0, s"q=$q est=$e true=$trueQ")
    }
  }

  test("kmv: sketch is the k smallest distinct hashes, invariant to " +
      "row order, duplication and partitioning") {
    val s = spark
    import s.implicits._
    val keys = (0 until 500).map(i => s"k$i")
    val rows = (keys ++ keys.take(200) ++ keys.reverse) // heavy dups
      .map(k => ("g", k))
    val got = Sketches
      .kmvSketch(rows.toDF("g", "key").repartition(7), "key", 64, "g")
      .select("kmv").as[Seq[Long]].head()
    // brute: same hash, distinct, sorted, take 64
    val brute = Sketches
      .kmvSketch(keys.map(k => ("g", k)).toDF("g", "key")
        .repartition(1), "key", 64, "g")
      .select("kmv").as[Seq[Long]].head()
    assert(got == brute)
    assert(got.length == 64 && got == got.distinct.sorted)
  }

  test("kmv overlap: exact branch when sets are smaller than k; " +
      "estimates within 25% at 50% true overlap") {
    val s = spark
    import s.implicits._
    // small sets (< k): estimates must EQUAL the exact values
    val small = (0 until 30).map(i => ("a", s"u$i")) ++
      (15 until 45).map(i => ("b", s"u$i"))
    val smallSk = Sketches.kmvSketch(small.toDF("g", "key"), "key", 64, "g")
    val se = Sketches.kmvOverlap(smallSk, "g", 64).collect().head
    assert(se.getAs[Double]("est_union") == 45.0)
    assert(se.getAs[Double]("est_intersection") == 15.0)
    assert(math.abs(se.getAs[Double]("est_jaccard") - 15.0 / 45.0) < 1e-6)
    // big sets: 2000 each, 1000 shared -> union 3000, jaccard 1/3
    val big = (0 until 2000).map(i => ("a", s"u$i")) ++
      (1000 until 3000).map(i => ("b", s"u$i"))
    val bigSk = Sketches.kmvSketch(big.toDF("g", "key"), "key", 64, "g")
    val be = Sketches.kmvOverlap(bigSk, "g", 64).collect().head
    val u = be.getAs[Double]("est_union")
    val j = be.getAs[Double]("est_jaccard")
    assert(math.abs(u - 3000.0) / 3000.0 < 0.25, s"union est $u")
    assert(math.abs(j - 1.0 / 3.0) < 0.15, s"jaccard est $j")
  }
}
