package graft

import org.apache.spark.sql.SparkSession

/** spark-submit entry point (north rule: "launched with spark-submit on
  * N and 4N executors"). Unlike the dev mains (Verify/Bench/QBench),
  * this builder NEVER forces a master: under spark-submit the cluster
  * manager supplies `spark.master` and executor sizing, and the session
  * inherits them — the same jar runs unchanged on local[N], YARN, k8s
  * or standalone. Shuffle partitions default to the cluster's
  * `default.parallelism` unless the submit conf overrides them.
  *
  *   spark-submit --class graft.Main graft.jar frontier <inDir> <table> <dumpId> [quota]
  *   spark-submit --class graft.Main graft.jar corpus   <inDir> <table> [minTokens]
  *
  * `frontier` runs one incremental FrontierJob batch against the
  * snapshot table (resumes from the latest committed snapshot);
  * `corpus` runs/resumes the CorpusJob pipeline over a spanized
  * parquet corpus (domain, ord, doc_id, spans).
  */
object Main {

  private[graft] def clusterSession(appName: String): SparkSession = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    // only force a master when NOTHING supplied one (bare `java -cp`
    // runs); spark-submit / SPARK_MASTER always win
    val withMaster =
      if (sys.props.contains("spark.master") ||
          sys.env.contains("SPARK_MASTER")) b
      else b.master(s"local[${Runtime.getRuntime.availableProcessors()}]")
    val spark = withMaster.getOrCreate()
    // LOCAL masters only: size shuffles to the core count instead of
    // Spark's fixed 200. On cluster managers defaultParallelism at
    // session-creation time reflects only the executors registered so
    // far (near zero under dynamic allocation), so pinning from it
    // would cap every shuffle — there, the submit conf + AQE coalesce
    // own the sizing, and any explicit setting is left untouched.
    // "Explicit" is detected via the SparkConf, not the resolved value:
    // comparing to "200" can't tell the built-in default from a user's
    // deliberate --conf spark.sql.shuffle.partitions=200.
    if (spark.sparkContext.master.startsWith("local") &&
        !spark.sparkContext.getConf.contains("spark.sql.shuffle.partitions"))
      spark.conf.set("spark.sql.shuffle.partitions",
        math.max(spark.sparkContext.defaultParallelism * 2, 32))
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: frontier <inDir> <table> <dumpId> [quota] | " +
      "corpus <inDir> <table> [minTokens]")
    // when embedded (tests, notebooks) getOrCreate returns the caller's
    // session — only stop what this main itself created
    val preexisting = SparkSession.getDefaultSession.isDefined
    val spark = clusterSession(s"graft-${args(0)}")
    args(0) match {
      case "frontier" =>
        require(args.length >= 4,
          "usage: frontier <inDir> <table> <dumpId> [quota]")
        val Array(_, inDir, table, dumpId) = args.take(4)
        val quota =
          if (args.length > 4) args(4).toInt else Int.MaxValue
        val r = graft.operators.FrontierJob.runBatch(
          spark, spark.read.parquet(inDir), table,
          politenessQuota = quota, dumpId = dumpId)
        println(s"committed snapshot ${r.manifest.snapshotId}: " +
          r.manifest.metrics.toSeq.sortBy(_._1)
            .map { case (k, v) => s"$k=$v" }.mkString(" "))
      case "corpus" =>
        require(args.length >= 3, "usage: corpus <inDir> <table> [minTokens]")
        val Array(_, inDir, table) = args.take(3)
        val minTokens = if (args.length > 3) args(3).toInt else 5
        val ms = graft.operators.CorpusJob.runPipeline(
          spark, spark.read.parquet(inDir), table, minTokens = minTokens)
        ms.foreach(m => println(
          s"stage ${m.snapshotId} (${m.lineage}): " +
          s"rows_in=${m.metrics("rows_in")} rows_out=${m.metrics("rows_out")}"))
      case other =>
        sys.error(s"unknown command $other (frontier|corpus)")
    }
    if (!preexisting) spark.stop()
  }
}
