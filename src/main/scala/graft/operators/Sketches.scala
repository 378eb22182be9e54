package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Mergeable cardinality sketches (Flajolet et al. 2007 HyperLogLog)
  * with a DETERMINISTIC hash, so the sketch itself is oracle-checkable
  * — unlike `approx_count_distinct`, whose HLL++ registers depend on
  * engine internals. At 100 TB this is how you count distinct URLs per
  * host/day without a distinct shuffle: registers are m rows per
  * group, merge = max per bucket (associative/commutative — partial
  * aggregation and cross-dump union both apply), and the estimate
  * reads registers only.
  *
  * Layout: m = 256 buckets. h = md5(key); bucket = first 2 hex digits
  * (8 bits); rho = leading-zero count of the next 56 bits + 1,
  * computed by STRING arithmetic on the hex form (4 bits per leading
  * '0' char + the first non-zero digit's own leading zeros) so both
  * engines evaluate the identical integer — no float anywhere until
  * the final estimate.
  */
object Sketches {

  val M = 256

  /** (bucket, rho) columns for one key expression. */
  def hllBucketCol(key: Column): Column =
    conv(substring(md5(key), 1, 2), 16, 10).cast(LongType)

  def hllRhoCol(key: Column): Column = {
    val rest = substring(md5(key), 3, 14)
    val z = length(regexp_extract(rest, "^0*", 0))
    // first non-zero hex digit's value (1..15); its own leading zeros
    // within 4 bits: 8-15 -> 0, 4-7 -> 1, 2-3 -> 2, 1 -> 3
    val d = conv(rest.substr(z + 1, lit(1)), 16, 10).cast(LongType)
    when(z === 14, lit(57L)).otherwise(
      lit(4L) * z +
        when(d >= 8, 0L).when(d >= 4, 1L).when(d >= 2, 2L).otherwise(3L) +
        1L)
  }

  /** Build registers per group: (groupCols*, bucket, r). Only occupied
    * buckets appear (missing bucket == register 0). ONE partial-agg
    * groupBy — the corpus never shuffles raw keys, only (group,
    * bucket, max-rho) partials.
    */
  def hllRegisters(df: DataFrame, keyCol: String,
                   groupCols: Seq[String] = Nil): DataFrame = {
    val base = df.select(
      groupCols.map(col) ++ Seq(
        hllBucketCol(col(keyCol)).as("bucket"),
        hllRhoCol(col(keyCol)).as("rho")): _*)
    base.groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("rho").as("r"))
  }

  /** Merge register sets (same layout): max per (group, bucket).
    * Associative and commutative — the cross-dump/cross-partition
    * combine.
    */
  def hllMerge(regs: DataFrame*): DataFrame = {
    require(regs.nonEmpty)
    val groupCols = regs.head.columns.filterNot(Set("r"))
    regs.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col): _*)
      .agg(max("r").as("r"))
  }

  // ---- count-min sketch (Cormode & Muthukrishnan 2005) ----

  /** Count-min parameters: `depth` independent hash rows ×
    * `width` buckets. Hash j of a key = first 2 hex digits of
    * md5(j || ':' || key) mod width — deterministic, so sketch
    * contents are oracle-checkable.
    */
  val CmsDepth = 4
  val CmsWidth = 64

  private def cmsBucket(j: Int, key: Column): Column =
    pmod(conv(substring(md5(concat(lit(s"$j:"), key)), 1, 2), 16, 10)
      .cast(LongType), lit(CmsWidth.toLong))

  /** Build the counter table: (j, bucket, cnt) — depth·width rows max,
    * regardless of input size. One explode by depth (constant factor)
    * + one partial-agg groupBy; counters are exact Longs, merge of two
    * sketches = sum per (j, bucket).
    */
  def cmsBuild(df: DataFrame, keyCol: String,
               weightCol: Option[String] = None): DataFrame = {
    val wc = weightCol.map(col(_).cast(LongType)).getOrElse(lit(1L))
    // ONE input scan: the depth rows explode from an inline array (a
    // per-depth union would re-read the corpus CmsDepth times)
    df.select(wc.as("w"), explode(array((0 until CmsDepth).map(j =>
        struct(lit(j).as("j"), cmsBucket(j, col(keyCol)).as("bucket")))
        .toIndexedSeq: _*)).as("c"))
      .groupBy(col("c.j").as("j"), col("c.bucket").as("bucket"))
      .agg(sum("w").as("cnt"))
  }

  /** Merge count-min sketches: sum per cell (the cross-partition /
    * cross-dump combine).
    */
  def cmsMerge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty)
    sketches.reduce(_.unionByName(_))
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
  }

  /** Point-query a set of keys: estimated count = min over the depth
    * rows (never under the true count; over only on collisions). The
    * sketch is cell-scale — AQE broadcasts it into the probe join.
    */
  def cmsQuery(keys: DataFrame, keyCol: String,
               sketch: DataFrame): DataFrame = {
    val probes = keys.select(col(keyCol),
        explode(array((0 until CmsDepth).map(j =>
          struct(lit(j).as("j"), cmsBucket(j, col(keyCol)).as("bucket")))
          .toIndexedSeq: _*)).as("c"))
      .select(col(keyCol), col("c.j").as("j"), col("c.bucket").as("bucket"))
    // left join: a probe hashing into a never-incremented cell reads 0
    // (an inner join would silently take the min over fewer rows)
    probes.join(sketch, Seq("j", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  /** Estimate per group from registers. Float discipline for the
    * oracle: per-register terms 2^(57-r) are exact Longs, their group
    * sum is exact (Decimal on Spark, HUGEINT in DuckDB), and the only
    * float math is the final alpha·m²·2^57 / sum expression written
    * with the same literals on both sides. Small-range (linear
    * counting) correction per the paper, its ln rounded to 6dp before
    * use.
    */
  def hllEstimate(registers: DataFrame,
                  groupCols: Seq[String] = Nil): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) registers.groupBy()
      else registers.groupBy(groupCols.map(col): _*)
    val agg = grouped.agg(
      count(lit(1)).as("n_present"),
      sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(57 - r AS INT))")
        .cast(DecimalType(38, 0))).as("sp"))
    val zeros = (lit(M.toLong) - col("n_present")).cast(LongType)
    val pow57 = 144115188075855872.0 // 2^57, exact double
    // coalesce: an all-empty register set sums to null; treating it as
    // 0 lets the zeros term carry the whole (linear-counting) estimate
    val sumPow = coalesce(col("sp"), lit(0)).cast("double") +
      zeros.cast("double") * lit(pow57)
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))
    val raw = alpha * lit(65536.0) * lit(pow57) / sumPow
    val small = lit(256.0) *
      round(log(lit(256.0) / zeros.cast("double")), 6)
    agg.select(
      groupCols.map(col) ++ Seq(
        zeros.as("zeros"),
        round(when(raw <= 640.0 && zeros > 0, small).otherwise(raw), 4)
          .as("est")): _*)
  }
}
