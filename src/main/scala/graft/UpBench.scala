package graft

import java.nio.file.Files

import graft.fixtures.CrawlFixtures
import graft.functions.Urls
import graft.operators.{IndexPipeline, UrlDedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the frontier batch's UPSTREAM
  * chain (parse → filter → anti-join → winner window → pin), the
  * dominant phase after the r6 rank/order rework. Each stage is timed
  * as an incremental count over the chain so the delta between lines
  * approximates the stage's own cost (min of `trials`).
  */
object UpBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n    = sys.env.getOrElse("SPARK_GRAFT_N", "4000000").toLong
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt
    Files.createDirectories(java.nio.file.Paths.get("/dev/shm/graft-spark"))
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val p = CrawlFixtures.Params(nRecords = n, nUrls = math.max(n / 3, 100),
      nHosts = math.max(n / 200, 20), filesPerDump = 64)
    val dir = Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "upb").toString
    CrawlFixtures.rawLinesDf(spark, p).write.parquet(s"$dir/in")
    val raw = spark.read.parquet(s"$dir/in")

    def timed(name: String)(f: => Unit): Unit = {
      val secs = (1 to trials).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[up] $name%-22s $secs%6.2f s")
    }

    timed("read only")(raw.count())
    timed("parse")(IndexPipeline.parseRaw(raw).count())
    timed("parse+filter")(
      IndexPipeline.filterIndex(IndexPipeline.parseRaw(raw), resort = false)
        .count())
    val filtered = IndexPipeline
      .filterIndex(IndexPipeline.parseRaw(raw), resort = false)
      .select("url", "warc", "offset", "length", "file", "file_ord",
              "line_ord")
    timed("+winner window")(UrlDedup.winnersKept(filtered).count())
    timed("+winner max_by") {
      val pri = struct(col("length"),
        (-col("file_ord")).cast("long"), -col("line_ord"))
      filtered.groupBy("url")
        .agg(max_by(struct(
          filtered.columns.filter(_ != "url").map(col): _*), pri).as("w"))
        .select(col("url") +: filtered.columns.filter(_ != "url")
          .map(c => col(s"w.$c")): _*)
        .count()
    }
    timed("+host_key")(
      UrlDedup.winnersKept(filtered)
        .withColumn("host_key", Urls.hostCol(col("url"))).count())
    timed("+pin (ckpt)") {
      val pinned = UrlDedup.winnersKept(filtered)
        .withColumn("host_key", Urls.hostCol(col("url")))
        .localCheckpoint()
      UrlDedup.releaseOrderCache(pinned)
    }
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
