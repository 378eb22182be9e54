package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev-only: time a single SparkEntry query (or several) without running
  * the full Bench. `runMain graft.QBench q_frequent_filter [q_lsh_dedup ...]`
  * against SPARK_GRAFT_SF_DIR (default sf0.1) at SPARK_GRAFT_CPUS.
  * Session config mirrors Bench (tmpfs spark.local.dir, UTC) so timings
  * preview Bench numbers.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    Files.createDirectories(Paths.get("/dev/shm/graft-spark"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q_agg_pricing")(spark, sfDir).count() // warm-up
    args.foreach { name =>
      val t0 = System.nanoTime()
      val n  = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[qbench] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s ($n rows)")
      spark.catalog.clearCache()
      // also free localCheckpoint blocks (not covered by clearCache)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
