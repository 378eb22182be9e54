package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of two dimension
  * columns so that sorting/partitioning by ONE key clusters rows that
  * are close in BOTH dimensions. At 100 TB this is how a single parquet
  * layout serves range predicates on either (or both) of two columns:
  * each file's (min, max) footer stats stay tight on BOTH dims, so a
  * box predicate prunes to O(boundary) files at the file listing — the
  * same mechanism the IVF index uses for lists, applied to plain
  * relational layout (Delta/Iceberg OPTIMIZE ZORDER lineage; public
  * Morton-curve construction).
  *
  * Everything is shift/mask column arithmetic — codegen'd, no UDF, and
  * exactly replayable in SQL by a second engine (the correctness gate).
  */
object Layout {

  /** Morton key: bit b of `x` lands at position 2b+1, bit b of `y` at
    * 2b — x-major interleave of the low `bits` bits of each. Inputs are
    * masked to `bits` bits first (callers with wider domains bucket or
    * shift down beforehand; two's-complement masking keeps negatives
    * consistent across engines, unlike `%`).
    */
  def zorderCol(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b + 1)
        .bitwiseOR(shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b))
    }.reduce(_ bitwiseOR _)
  }

  /** The SQL twin of [[zorderCol]] (same shape, any engine with
    * integer shift/mask ops), for oracle generation.
    */
  def zorderSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { b =>
      s"(((($x >> $b) & 1) << ${2 * b + 1}) | ((($y >> $b) & 1) << ${2 * b}))"
    }.mkString("(", " | ", ")")

  /** Per-bucket layout statistics under a z-range bucketing: bucket =
    * top `bucketBits` bits of the z key (a fixed z-range per bucket —
    * what a z-sorted file layout gives each file), with the (min, max)
    * footer stats a scan would consult per dimension, plus sum(z) so a
    * checker is sensitive to every bit of every row's key. No window,
    * no global count: bucket assignment is pure row-local arithmetic
    * and the stats are one partial-aggregated groupBy of 2^bucketBits
    * rows — the plan is identical at any scale.
    */
  def zBucketStats(df: DataFrame, xCol: String, yCol: String,
                   bits: Int, bucketBits: Int): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 2 * bits)
    df.withColumn("__z", zorderCol(col(xCol), col(yCol), bits))
      .withColumn("bucket", shiftright(col("__z"), 2 * bits - bucketBits))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
        min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"),
        sum(col("__z")).as("sum_z"))
  }

  /** Footer-stats pruning verdict for a box predicate: a bucket is a
    * candidate iff its (min, max) ranges overlap the box on both dims —
    * exactly the test a parquet reader runs per file. Buckets with
    * candidate=false are never opened; min/max guarantee no false
    * negatives.
    */
  def boxCandidates(stats: DataFrame,
                    x0: Long, x1: Long, y0: Long, y1: Long): DataFrame =
    stats.withColumn("candidate",
      !(col("max_x") < x0 || col("min_x") > x1 ||
        col("max_y") < y0 || col("min_y") > y1))

  /** Exact equi-join size estimation + strategy advice, from per-key
    * counts alone (two partial aggs over the key — never the join
    * itself): join_rows = Σ_k cnt_a(k)·cnt_b(k), max_key_out = the
    * largest single key's output. Strategy rule: `broadcast` when the
    * smaller side fits `broadcastRowLimit`; else `salted_shuffle` when
    * one key's output exceeds its fair share of `parallelism` tasks by
    * 4× (the AQE-skew-style bound, derived not guessed); else
    * `shuffle`. This is the pre-flight you run before keying a 100 TB
    * join — the estimate costs two scans of the KEYS, not a trial
    * join.
    */
  def joinEstimate(a: DataFrame, b: DataFrame, keyCols: Seq[String],
                   parallelism: Int,
                   broadcastRowLimit: Long = 1000000L): DataFrame = {
    require(keyCols.nonEmpty && parallelism > 0)
    val ka = a.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("ca"))
    val kb = b.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cb"))
    val j = ka.join(kb, keyCols)
      .agg(
        count(lit(1)).as("keys_common"),
        sum(col("ca") * col("cb")).as("join_rows"),
        max(col("ca") * col("cb")).as("max_key_out"))
    val totals = ka.agg(sum(col("ca")).as("rows_a"),
        count(lit(1)).as("keys_a"))
      .crossJoin(kb.agg(sum(col("cb")).as("rows_b"),
        count(lit(1)).as("keys_b")))
    totals.crossJoin(j)
      .select(
        col("rows_a"), col("rows_b"), col("keys_a"), col("keys_b"),
        coalesce(col("keys_common"), lit(0L)).as("keys_common"),
        coalesce(col("join_rows"), lit(0L)).as("join_rows"),
        coalesce(col("max_key_out"), lit(0L)).as("max_key_out"),
        when(least(col("rows_a"), col("rows_b")) <= broadcastRowLimit,
          lit("broadcast"))
          .when(col("max_key_out") * parallelism >
            col("join_rows") * 4, lit("salted_shuffle"))
          .otherwise(lit("shuffle")).as("strategy"))
  }

  /** Shuffle-key skew report — the diagnostic you run BEFORE keying a
    * 100 TB join/agg on a column: per-key row counts reduced to one
    * row of distribution shape. `skew_ratio` = max/mean is the direct
    * straggler bound (the biggest partition does skew_ratio× the
    * average task's work); `gini` summarizes whole-distribution
    * imbalance (0 uniform → 1 one-key-takes-all); `suggested_salt` =
    * ceil(max_cnt · parallelism / total) is the salt factor that
    * brings the hottest key back to one task's fair share (1 = no salt
    * needed — exactly the Frontier/O10 salting rule, derived from data
    * instead of guessed).
    *
    * Exact discrete stats, no sampling: p50/p90/p99 are the counts at
    * ceil(q·n_keys) in ascending order (type-7-free, engine-exact),
    * gini via the rank-weighted form 2·Σ(i·x₍ᵢ₎)/(n·Σx) − (n+1)/n on
    * ascending (count, key) order. One partial-agg count per key +
    * one rank window over KEYS (not rows) — the report costs one scan
    * however wide the data.
    */
  def skewReport(df: DataFrame, keyCols: Seq[String],
                 parallelism: Int): DataFrame = {
    require(keyCols.nonEmpty && parallelism > 0)
    import org.apache.spark.sql.expressions.Window
    val keyed = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    val ord = Window.orderBy(col("cnt"),
      concat_ws("", keyCols.map(c => col(c).cast("string")): _*))
    val ranked = keyed.withColumn("__i", row_number().over(ord))
    ranked.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"),
      sum(col("cnt") * col("__i")).as("__iw"))
      .crossJoin(broadcast(
        ranked.crossJoin(broadcast(
          ranked.agg(max(col("__i")).as("__n"))))
          .agg(
            max(when(col("__i") ===
              ceil(col("__n") * 0.5).cast("long"), col("cnt"))).as("p50"),
            max(when(col("__i") ===
              ceil(col("__n") * 0.9).cast("long"), col("cnt"))).as("p90"),
            max(when(col("__i") ===
              ceil(col("__n") * 0.99).cast("long"), col("cnt"))).as("p99"))))
      .select(
        col("n_keys"), col("n_rows"), col("max_cnt"),
        col("p50"), col("p90"), col("p99"),
        round(col("max_cnt") * col("n_keys") * lit(1.0) / col("n_rows"), 4)
          .as("skew_ratio"),
        round(lit(2.0) * col("__iw") / (col("n_keys") * col("n_rows"))
          - (col("n_keys") + lit(1.0)) / col("n_keys"), 6).as("gini"),
        greatest(lit(1L),
          ceil(col("max_cnt") * lit(parallelism.toLong) * lit(1.0)
            / col("n_rows")).cast("long")).as("suggested_salt"))
  }

  /** Deterministic per-epoch training-data shuffle plan: every document
    * gets a pseudorandom shard and an in-shard position from
    * md5(doc_id ":" epoch) — a different, reproducible global
    * permutation per epoch with NO stored permutation table and no RNG
    * state (the property a 100-TB loader needs: any worker can compute
    * any shard's read order independently). One shuffle keyed by shard;
    * the in-shard order is the md5 key sort, environment-independent.
    * Output: (idCol, shard, pos) — pos is the contiguous 1-based read
    * position within the shard.
    */
  def epochShuffle(docs: DataFrame, epoch: Int, nShards: Int,
                   idCol: String = "doc_id"): DataFrame = {
    val key = md5(concat(col(idCol).cast("string"), lit(":" + epoch)))
    val shard = conv(substring(key, 1, 6), 16, 10).cast("long") %
      lit(nShards.toLong)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__key").asc, col(idCol).asc)
    docs.select(col(idCol), key.as("__key"), shard.as("shard"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__key")
  }
}
