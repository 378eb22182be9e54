package graft

import java.nio.file.Files

import graft.fixtures.CrawlFixtures
import graft.operators._
import graft.functions.Urls
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase profiler for the frontier pipeline. */
object BenchDebug {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a  = f
    println(f"[phase] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    a
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n    = sys.env.getOrElse("SPARK_GRAFT_N", "200000").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"== cpus=$cpus n=$n ==")

    val p = CrawlFixtures.Params(nRecords = n, nUrls = math.max(n / 3, 100),
                                 nHosts = math.max(n / 200, 20), filesPerDump = 8)
    val lines = t("gen+cache") {
      val df = CrawlFixtures.rawLinesDf(spark, p)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count(); df
    }
    t("parse only") {
      IndexPipeline.parseRaw(lines).count()
    }
    t("parse+filters no win") {
      IndexPipeline.parseRaw(lines)
        .filter(!col("url").rlike("/robots\\.txt") && col("status") === 200)
        .withColumn("mime", graft.functions.Mimes.normalizeCol(col("mime")))
        .filter(col("mime").isin(graft.functions.Mimes.DefaultAllowed.toSeq: _*))
        .withColumn("domain", Urls.domainCol(col("url")))
        .count()
    }
    val filtered = t("parse+filter") {
      val df = IndexPipeline.filterIndex(IndexPipeline.parseRaw(lines))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count(); df
    }
    val winners = t("winners") {
      val df = UrlDedup.winners(filtered)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count(); df
    }
    val kept = t("keepWinners") {
      val df = UrlDedup.keepWinners(filtered, winners)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count(); df
    }
    val hosted = kept.withColumn("host_key", Urls.hostCol(col("url")))
    val ranked = t("politeness") {
      val df = Frontier.politenessRank(hosted, "host_key",
        Seq(asc("file_ord"), asc("line_ord")), Int.MaxValue)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count(); df
    }
    val ordered = t("crawlOrder") {
      val df = UrlDedup.crawlOrder(ranked)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count(); df
    }
    t("bloom+anti") {
      UrlDedup.antiJoinSeen(filtered, winners.select("url"), spark).count()
    }
    val tdir = Files.createTempDirectory("dbg").toString
    t("write parquet") {
      ordered.write.mode("overwrite").parquet(s"$tdir/batches")
    }
    t("cuckoo update") {
      graft.state.UrlSeenState.updateDistributed(
        spark, winners.select(xxhash64(col("url")).as("h")), None,
        java.nio.file.Paths.get(tdir, "state"), 16, 1 << 16)
    }
    spark.stop()
  }
}
