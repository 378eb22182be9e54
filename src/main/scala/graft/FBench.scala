package graft
import java.nio.file.Files
import graft.fixtures.CrawlFixtures
import graft.operators.FrontierJob
import org.apache.spark.sql.SparkSession
object FBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n    = sys.env.getOrElse("SPARK_GRAFT_N", "4000000").toLong
    // SPARK_GRAFT_MASTER=spark://host:7077 runs against a standalone
    // cluster (multi-executor evidence); default stays local[cpus]
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = SparkSession.builder().master(master)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_PARTS", (cpus * 2).toString))
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
    val shufW     = new java.util.concurrent.atomic.AtomicLong(0L)
    val shufR     = new java.util.concurrent.atomic.AtomicLong(0L)
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
            shufW.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
            shufR.addAndGet(e.taskMetrics.shuffleReadMetrics.totalBytesRead)
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
    // trials loop (fresh snapshot table per trial): min filters the
    // VM's steal-noise windows, which inflate single runs by 50%+.
    // Listener counters are snapshotted PER TRIAL (delta from trial
    // start) and the reported metrics come from the winning (min-time)
    // trial only — accumulating across trials while dividing by one
    // trial's wall inflated avg_active_cores/gc/shuffle by ~trial count.
    case class TrialStats(secs: Double, taskNs: Long, gcMs: Long,
                          shW: Long, shR: Long, jobs: Long,
                          coveredS: Double)
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "1").toInt
    val stats = (1 to trials).map { tr =>
      val ttable =
        if (tr == 1) table
        else Files.createTempDirectory(java.nio.file.Paths.get("/dev/shm"), "fbt").toString
      jobSpans.clear()
      val (tn0, gc0, sw0, sr0, nj0) =
        (taskNanos.get(), gcMillis.get(), shufW.get(), shufR.get(), nJobs.get())
      val t0 = System.nanoTime()
      FrontierJob.runBatch(spark, spark.read.parquet(s"$table/in1"), ttable, politenessQuota = Int.MaxValue, dumpId = "1", cacheIntermediates = sys.env.contains("SPARK_GRAFT_CACHE"))
      FrontierJob.runBatch(spark, spark.read.parquet(s"$table/in2"), ttable, politenessQuota = Int.MaxValue, dumpId = "2", cacheIntermediates = sys.env.contains("SPARK_GRAFT_CACHE"))
      val s = (System.nanoTime() - t0) / 1e9
      // merged job-interval coverage (s) -> uncovered wall = driver gaps
      val spans = {
        import scala.jdk.CollectionConverters._
        jobSpans.asScala.toSeq.sortBy(_._1)
      }
      val covered = {
        var total = 0L; var end = 0L
        spans.foreach { case (st, e) =>
          if (e > end) { total += e - math.max(st, end); end = e }
        }
        total / 1e3
      }
      if (tr != 1) org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ttable))
      println(f"[fbench-trial] $tr: $s%.2f s")
      TrialStats(s, taskNanos.get() - tn0, gcMillis.get() - gc0,
        shufW.get() - sw0, shufR.get() - sr0, nJobs.get() - nj0, covered)
    }
    val best = stats.minBy(_.secs)
    val secs = best.secs
    val activeCores = best.taskNs / 1e9 / secs
    val spread = stats.map(_.secs)
    println(f"[fbench] cpus=$cpus n=$n secs=$secs%.2f rate=${(n / secs).round} " +
      f"avg_active_cores=$activeCores%.1f gc_s=${best.gcMs / 1e3}%.1f " +
      f"jobs=${best.jobs} job_covered_s=${best.coveredS}%.1f " +
      f"shuffle_w_mb=${best.shW / 1e6}%.0f shuffle_r_mb=${best.shR / 1e6}%.0f " +
      f"shuffle_w_b_per_url=${best.shW.toDouble / n}%.1f " +
      s"trial_secs=[${spread.map(x => f"$x%.2f").mkString(",")}]")
    spark.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(table))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wtable))
  }
}
