package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.sql.Row

/** URL-seen set construction + frontier dedup (SURVEY.md §2.4 A0, §2.3
  * J2/J3, §2.5 O3) — the reference's single-process bottleneck
  * (deduplicate_index_urls.py, README.md:185–187) as distributed
  * aggregations.
  *
  * Winner semantics (uniq_record, deduplicate_index_urls.py:135–156):
  * a later record replaces the incumbent only when *strictly greater*
  * (`<=` rejects), so the overall winner per URL is
  *   keep=biggest: max length, ties -> earliest (file_ord, line_ord)
  *   keep=latest:  max warc string, ties -> earliest (file_ord, line_ord)
  * Expressed as one `max_by` aggregation — Catalyst's partial+final hash
  * agg is exactly the reference's per-file dict + global merge, minus the
  * single process.
  */
object UrlDedup {

  /** Priority struct for max_by: lexicographic on (key, -file_ord,
    * -line_ord) so equal keys resolve to the earliest processing order.
    */
  private def priority(keep: String): Column = keep match {
    case "latest" =>
      struct(col("warc"), (-col("file_ord")).cast(LongType),
             -col("line_ord"))
    case _ =>
      struct(col("length"), (-col("file_ord")).cast(LongType),
             -col("line_ord"))
  }

  /** A0: one winner row per URL. */
  def winners(filtered: DataFrame, keep: String = "biggest"): DataFrame =
    filtered
      .groupBy("url")
      .agg(
        max_by(
          struct(col("warc"), col("offset"), col("length"),
                 col("file").as("index")),
          priority(keep)
        ).as("w")
      )
      .select(col("url"), col("w.warc"), col("w.offset"), col("w.length"),
              col("w.index"))

  /** J3: re-scan keep — lines whose (url, warc, offset, length) equal the
    * stored winner (IndexRecord.__eq__ with index=None matches all).
    */
  def keepWinners(filtered: DataFrame, winnersDf: DataFrame): DataFrame =
    filtered.join(
      winnersDf.select("url", "warc", "offset", "length"),
      Seq("url", "warc", "offset", "length"),
      "left_semi")

  /** J2: drop entries whose URL is already in the seen set. The bloom
    * pre-pass keeps definitely-new URLs out of the anti-join shuffle
    * entirely — at frontier scale the seen set is orders of magnitude
    * larger than a day's discoveries, so the join only sees the
    * maybe-seen sliver (false-positive rate `fpp`).
    */
  def antiJoinSeen(entries: DataFrame, seenUrls: DataFrame,
                   spark: SparkSession, fpp: Double = 0.01,
                   expectedItems: Option[Long] = None): DataFrame = {
    val nSeen = expectedItems.getOrElse(seenUrls.count())
    if (nSeen == 0) return entries
    val bloom = seenUrls.stat.bloomFilter("url", math.max(nSeen, 64), fpp)
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((u: String) => u != null && bloomBc.value.mightContainString(u))

    val definitelyNew = entries.filter(!mightContain(col("url")))
    val maybeSeen     = entries.filter(mightContain(col("url")))
      .join(seenUrls.select("url"), Seq("url"), "left_anti")
    definitelyNew.unionByName(maybeSeen)
  }

  /** O3: global crawl-order sort by (warc, offset) with a stable total
    * tie-break, plus a contiguous 0-based `ord` column. The `ord` is
    * assigned per-partition after the range-partitioned sort (no
    * single-partition window): zipWithIndex runs one lightweight count
    * job and a narrow map — scale-safe.
    */
  def crawlOrder(kept: DataFrame): DataFrame = {
    val sortCols = Seq(asc("warc"), asc("offset"), asc("url"),
                       asc("file_ord"), asc("line_ord"))
    val sorted = kept.orderBy(sortCols: _*)
    val schema = StructType(sorted.schema.fields :+
      org.apache.spark.sql.types.StructField("ord", LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }

  /** Fetch-batch assignment: the reference chunks the crawl-ordered index
    * into 1000-line shards per download thread
    * (download_pages.py:226–237); batch id = ord / batchSize.
    */
  def fetchBatches(ordered: DataFrame, batchSize: Long = 1000): DataFrame =
    ordered.withColumn("batch_id", (col("ord") / batchSize).cast(LongType))
}
