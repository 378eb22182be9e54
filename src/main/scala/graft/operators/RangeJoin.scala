package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: points `v` against intervals `[lo, hi]` with
  * lo <= v <= hi — the lookup behind IP-to-geo tables, time-window
  * membership, and byte-range-to-shard routing. Spark's built-in plan
  * for a pure range predicate is broadcast-nested-loop (O(n·m) row
  * comparisons) — a scale-killer the moment neither side broadcasts.
  *
  * Scale path: equi-join by BUCKET. Points land in one bucket
  * (floor(v / w)); each interval explodes to every bucket it covers.
  * A qualifying (point, interval) pair meets in exactly ONE bucket —
  * the point's — so the exact `between` post-filter needs no dedup.
  * Cost: one hash shuffle keyed by bucket; candidate row count is
  * |points| + Σ interval spans/w, tunable by `bucketWidth` to the
  * interval length distribution. Floor division is spelled out with
  * pmod so negative domains bucket identically on every engine.
  *
  * A single giant interval would explode into range/w bucket rows and
  * its bucket keys would ride one shuffle partition each — bounded,
  * but wasteful past a point: intervals wider than
  * `maxBucketsPerInterval` buckets fail loudly with advice (raise the
  * width, or route mega-intervals to a broadcast side-channel) rather
  * than melting silently — the semDedup mega-cluster discipline.
  */
object RangeJoin {

  // (v - pmod(v, w)) is exactly divisible, so the double division is
  // exact while |bucket| < 2^53 — far past any physical bucket count
  private def bucketOf(v: Column, w: Long): Column =
    ((v - pmod(v, lit(w))) / lit(w)).cast("long")

  def rangeJoin(points: DataFrame, intervals: DataFrame,
                vCol: String, loCol: String, hiCol: String,
                bucketWidth: Long,
                maxBucketsPerInterval: Long = 4096): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    val nb = bucketOf(col(hiCol), bucketWidth) -
      bucketOf(col(loCol), bucketWidth) + 1
    val tooWide = intervals
      .filter(col(hiCol) >= col(loCol) && nb > maxBucketsPerInterval)
      .limit(1).count()
    require(tooWide == 0,
      s"rangeJoin: an interval spans more than $maxBucketsPerInterval " +
        s"buckets at width $bucketWidth — raise bucketWidth (or broadcast " +
        "the mega-intervals separately); failing loudly instead of " +
        "exploding the bucket table")
    val ib = intervals
      .filter(col(hiCol) >= col(loCol))
      .withColumn("__b", explode(sequence(
        bucketOf(col(loCol), bucketWidth),
        bucketOf(col(hiCol), bucketWidth))))
    val pb = points.withColumn("__b", bucketOf(col(vCol), bucketWidth))
    pb.join(ib, Seq("__b"))
      .filter(col(vCol).between(col(loCol), col(hiCol)))
      .drop("__b")
  }
}
