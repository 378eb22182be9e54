package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dev-only phase profiler for the frequent-paragraphs chain. */
object FreqDebug {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a  = f
    println(f"[phase] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    a
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("/dev/shm/graft-spark"))
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import graft.operators.{DocPipeline, FrequentParagraphs}
    graft.expressions.MinHashExpressions.register(s)
    val b = graft.functions.MinHashF.optimalBands(0.95)

    val html = Sessions.table(s, sfDir, "documents").select(
      col("doc_id"), col("source"),
      concat(lit("<p>"),
             call_function("replace", col("text"), lit(" slow "), lit("</p><p>")),
             lit("</p><p>common footer paragraph for "), col("source"),
             lit(" shared across documents</p>"),
             lit("<img src=\"http://img.example.com/"), col("doc_id"),
             lit(".png\">")).as("chunk_body"),
      lit("text/html").as("mime"))

    t("spanize only") {
      DocPipeline.spanize(html).select(sum(size(col("spans")))).head()
    }
    val docs = t("spanize+minhash persist") {
      val d = DocPipeline.spanize(html)
        .select(col("source").as("domain"),
                col("doc_id").cast(LongType).as("ord"),
                col("doc_id"), col("spans"))
        .withColumn("pbands", FrequentParagraphs.paragraphBandsCol(
          FrequentParagraphs.textSpans(col("spans")), b))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      d.count(); d
    }
    val freq = t("collect") {
      val f = FrequentParagraphs.collect(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      f.count(); f
    }
    t("filterFrequent") {
      FrequentParagraphs.filterFrequent(docs, freq)
        .groupBy("domain")
        .agg(count(lit(1)).as("n_docs"), sum(size(col("spans"))).as("n_spans"))
        .count()
    }
    s.stop()
  }
}
