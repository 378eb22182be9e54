package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dev-only: stage-by-stage noop timing of q_ngram_containment's
  * containmentJoin chain (guide §1.4).
  */
object ContainProbe {
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
    def t(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val toksD = array_sort(array_distinct(split(trim(col("text")), "\\s+")))
    val kKeep = ceil(size(toksD) * lit(0.7)).cast("int")
    val excerpts = base
      .filter(pmod(col("doc_id").cast(LongType), lit(10L)) === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("source"),
        concat_ws(" ",
          array_join(slice(toksD, lit(1), kKeep), " "),
          concat(lit("zzza"), col("doc_id")),
          concat(lit("zzzb"), col("doc_id"))).as("text"))
    val sets0 = graft.operators.SetSimilarity
      .wordSets(base.unionByName(excerpts)).localCheckpoint()
    val t0 = System.nanoTime()
    val sets = sets0.select(col("doc_id").as("id"), col("source").as("blk"),
      col("ws"), col("c"))
    val tokens = sets.select(col("id"), col("blk"), col("c"),
      explode(col("ws")).as("word"))
    t("tokens")(tokens)
    val dfreq = tokens.groupBy("word").agg(count(lit(1)).as("df"))
    t("dfreq")(dfreq)
    val tt = 0.8
    val prefixA = tokens.join(dfreq, Seq("word"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy(asc("df"), asc("word"))))
      .filter(col("rk") <= col("c") - ceil(col("c") * lit(tt)) + 1)
      .select(col("id").as("a_id"), col("blk"), col("word"),
              col("c").as("na"))
    t("prefixA")(prefixA)
    val allB = tokens.select(col("id").as("b_id"), col("blk"),
                             col("word"), col("c").as("nb"))
    val candRaw = prefixA.join(allB, Seq("blk", "word"))
      .filter(col("a_id") =!= col("b_id") &&
              col("nb") >= col("na") * lit(tt))
      .select("a_id", "b_id")
    t("cand raw")(candRaw)
    val cand = candRaw.distinct()
    t("cand distinct")(cand)
    val ver = cand
      .join(sets.select(col("id").as("a_id"), col("ws").as("wa"),
                        col("c").as("na")), Seq("a_id"))
      .join(sets.select(col("id").as("b_id"), col("ws").as("wb")),
            Seq("b_id"))
      .withColumn("i",
        size(array_intersect(col("wa"), col("wb"))).cast(LongType))
      .filter(col("i") * lit(1.0) / col("na") >= tt)
      .select(col("a_id"), col("b_id"),
        round(col("i") * lit(1.0) / col("na"), 4).as("containment"))
    t("verified (full)")(ver)
    spark.stop()
  }
}
