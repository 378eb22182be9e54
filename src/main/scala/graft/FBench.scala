package graft
import java.nio.file.Files
import graft.fixtures.CrawlFixtures
import graft.operators.FrontierJob
import org.apache.spark.sql.SparkSession
object FBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n    = sys.env.getOrElse("SPARK_GRAFT_N", "4000000").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_PARTS", cpus.toString))
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.shuffle.compress", sys.env.getOrElse("SPARK_SHUFFLE_COMPRESS", "true"))
      .config("spark.shuffle.spill.compress", sys.env.getOrElse("SPARK_SHUFFLE_COMPRESS", "true"))
      .config("spark.memory.offHeap.enabled", sys.env.getOrElse("SPARK_GRAFT_OFFHEAP", "true"))
      .config("spark.memory.offHeap.size", sys.env.getOrElse("SPARK_GRAFT_OFFHEAP_SIZE", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val p = CrawlFixtures.Params(nRecords = n, nUrls = math.max(n / 3, 100),
      nHosts = math.max(n / 200, 20), filesPerDump = 64)
    val table = Files.createTempDirectory(java.nio.file.Paths.get("/dev/shm"), "fb").toString
    val lines = CrawlFixtures.rawLinesDf(spark, p)
    lines.filter("line_ord % 2 = 0").write.parquet(s"$table/in1")
    lines.filter("line_ord % 2 = 1").write.parquet(s"$table/in2")
    // warmup on a small slice
    val wtable = Files.createTempDirectory(java.nio.file.Paths.get("/dev/shm"), "fbw").toString
    FrontierJob.runBatch(spark, spark.read.parquet(s"$table/in1").limit(100000), wtable, politenessQuota = Int.MaxValue)
    // task-time listener: average active cores = task-seconds / wall;
    // job intervals: wall not covered by any running job = driver gap
    val taskNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    val gcMillis  = new java.util.concurrent.atomic.AtomicLong(0L)
    val nJobs     = new java.util.concurrent.atomic.AtomicLong(0L)
    val jobSpans  = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Integer, java.lang.Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          if (e.taskMetrics != null) {
            taskNanos.addAndGet(e.taskMetrics.executorRunTime * 1000000L)
            gcMillis.addAndGet(e.taskMetrics.jvmGCTime)
          }
        }
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          nJobs.incrementAndGet()
          jobStarts.put(e.jobId, e.time)
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = jobStarts.remove(e.jobId)
          if (s != null) jobSpans.add((s.longValue(), e.time))
        }
      })
    val t0 = System.nanoTime()
    FrontierJob.runBatch(spark, spark.read.parquet(s"$table/in1"), table, politenessQuota = Int.MaxValue, dumpId = "1", cacheIntermediates = sys.env.contains("SPARK_GRAFT_CACHE"))
    FrontierJob.runBatch(spark, spark.read.parquet(s"$table/in2"), table, politenessQuota = Int.MaxValue, dumpId = "2", cacheIntermediates = sys.env.contains("SPARK_GRAFT_CACHE"))
    val secs = (System.nanoTime() - t0) / 1e9
    val activeCores = taskNanos.get() / 1e9 / secs
    // merged job-interval coverage (ms) -> uncovered wall = driver gaps
    val spans = {
      import scala.jdk.CollectionConverters._
      jobSpans.asScala.toSeq.sortBy(_._1)
    }
    val covered = {
      var total = 0L; var end = 0L
      spans.foreach { case (s, e) =>
        if (e > end) { total += e - math.max(s, end); end = e }
      }
      total / 1e3
    }
    println(f"[fbench] cpus=$cpus n=$n secs=$secs%.2f rate=${(n / secs).round} " +
      f"avg_active_cores=$activeCores%.1f gc_s=${gcMillis.get() / 1e3}%.1f " +
      f"jobs=${nJobs.get()} job_covered_s=$covered%.1f")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(table))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wtable))
  }
}
