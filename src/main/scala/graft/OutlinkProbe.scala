package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dev-only: stage-by-stage noop timing of the q_outlinks chain (guide
  * §1.4) to locate the per-task hotspot before touching the operator.
  */
object OutlinkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    Files.createDirectories(Paths.get("/dev/shm/graft-spark"))
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Links
    graft.expressions.UrlExpressions.register(spark)
    def t(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val e = col("event_id")
    def pages = spark.read.parquet(s"$sfDir/events.parquet").select(
      e,
      concat(lit("https://h"), pmod(col("user_id"), lit(20L)),
        lit(".example.com/d"), pmod(e, lit(5L)), lit("/s/page"),
        pmod(e, lit(7L)), lit(".html")).as("url"),
      concat(
        lit("<html>"),
        when(pmod(e, lit(11L)) === 0,
          lit("<meta name=\"robots\" content=\"noindex, nofollow\">"))
          .otherwise(lit("")),
        lit("<a rel=\"nofollow\" href=\"/paid"), pmod(e, lit(3L)),
        lit("\">pd</a>"),
        lit("<a href=\"/top"), pmod(e, lit(9L)), lit("\">t</a>"),
        lit("<a href=\"rel"), pmod(e, lit(4L)), lit(".html\">r</a>"),
        lit("<a href=\"../up"), pmod(e, lit(3L)), lit("\">u</a>"),
        lit("<a href='//cdn.example.org/x"), pmod(e, lit(5L)),
        lit("'>c</a>"),
        lit("<a href=\"https://ext.example.net/a?x=1&amp;y="),
        pmod(e, lit(2L)), lit("\">a</a>"),
        lit("<a href=\"mailto:x@y.z\">m</a><a href=\"#f\">f</a>" +
          "<a href=\"javascript:void(0)\">j</a><a href=\"\">e</a>" +
          "</html>")).as("html"))
    // warm
    t("warm pages")(pages)
    t("pages")(pages)
    t("+meta filter")(pages.where(!col("html").rlike(Links.MetaNofollow)))
    val tags = pages.where(!col("html").rlike(Links.MetaNofollow))
      .select(col("event_id"), col("url"),
        explode(Links.anchorTagsCol(col("html"))).as("tag"))
    t("+anchor explode")(tags)
    val nf = tags.where(!col("tag").rlike(Links.NofollowRel))
    t("+tag nofollow")(nf)
    val href = nf.withColumn("href",
      graft.sources.Sitemaps.xmlUnescape(Links.hrefFromTag(col("tag"))))
    t("+href+unescape")(href)
    val res = href.withColumn("link",
      Links.resolveCol(col("url"), col("href")))
      .where(col("link").isNotNull)
      .select(col("event_id"), col("url"), col("link"))
    t("+resolve")(res)
    t("+distinct (full)")(res.distinct())
    spark.stop()
  }
}
