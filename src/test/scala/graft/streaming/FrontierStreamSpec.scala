package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import graft.fixtures.CrawlFixtures
import graft.operators.{IndexPipeline, UrlDedup}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class FrontierStreamSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming winner state converges to the batch A0 winners") {
    val p     = CrawlFixtures.Params(nRecords = 1500, nUrls = 400, nHosts = 15)
    val lines = CrawlFixtures.rawLines(p)
    val filtered = IndexPipeline.filterIndex(
      IndexPipeline.parseRaw(lines.toDF()))
      .select($"url", $"warc", $"offset", $"length", $"file_ord", $"line_ord")

    // batch winners (ground truth)
    val batchWinners = UrlDedup.winners(
      filtered.withColumn("file", lit("f")), "biggest")
      .select($"url", $"warc", $"offset", $"length")
      .as[(String, String, Long, Long)].collect().toSet

    // stream the same entries from parquet in several files (micro-batches)
    val dir = Files.createTempDirectory("stream-in").toString
    filtered.repartition(6).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(filtered.schema)
      .option("maxFilesPerTrigger", 2)
      .parquet(dir)
      .as[FrontierStream.Entry]

    val updates = FrontierStream.winnerUpdates(stream)
    val q = updates.writeStream
      .outputMode("update")
      .format("memory")
      .queryName("winner_updates")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // The final stored state per url beats every other logged update
    // under the strict priority order, so it is exactly the argmax of the
    // update log under the same (length, -file_ord, -line_ord) priority —
    // recompute it with the batch winners operator over the log.
    val emitted = spark.sql(
      "SELECT url, warc, offset, length, file_ord, line_ord FROM winner_updates")
    val finalPerUrl = UrlDedup.winners(
      emitted.withColumn("file", lit("f")), "biggest")
      .select($"url", $"warc", $"offset", $"length")
      .as[(String, String, Long, Long)].collect().toSet
    assert(finalPerUrl == batchWinners)
    spark.sql("DROP TABLE IF EXISTS winner_updates")
  }

  test("streaming cross-dedup: later batches drop on any band collision") {
    import FrontierStream.{BandRow, DedupVerdict}
    val dir = Files.createTempDirectory("stream-bands").toString
    // batch 1 (file b1): docs a, b with disjoint buckets
    Seq(BandRow("a", 0, 100L), BandRow("a", 1, 101L),
        BandRow("b", 0, 200L), BandRow("b", 1, 201L))
      .toDF().coalesce(1).write.parquet(s"$dir/b1")
    // batch 2 (file b2): c collides with a on band 1; d is clean
    Seq(BandRow("c", 0, 300L), BandRow("c", 1, 101L),
        BandRow("d", 0, 400L), BandRow("d", 1, 401L))
      .toDF().coalesce(1).write.parquet(s"$dir/b2")
    val stream = spark.readStream
      .schema(Seq.empty[BandRow].toDF().schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/*")
      .as[BandRow]
    val q = FrontierStream.crossDedupUpdates(stream)
      .writeStream.outputMode("update").format("memory")
      .queryName("dedup_verdicts").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val survived = spark.sql(
      "SELECT doc_id, max(CAST(dup AS INT)) AS d FROM dedup_verdicts GROUP BY doc_id")
      .collect().map(r => r.getString(0) -> (r.getInt(1) == 1)).toMap
    assert(survived == Map("a" -> false, "b" -> false,
                           "c" -> true, "d" -> false))
    spark.sql("DROP TABLE IF EXISTS dedup_verdicts")
  }

  test("windowed host stats run on a bounded stream") {
    val dir = Files.createTempDirectory("stream-ev").toString
    val ev = (0 until 500).map { i =>
      (new java.sql.Timestamp(1700000000000L + i * 60000L),
       s"h${i % 7}.example.com", 100L + i)
    }.toDF("ts", "host_key", "length")
    ev.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(ev.schema).parquet(dir)
    val q = FrontierStream.hostWindowStats(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("host_stats").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // watermark closes all but the trailing window(s); with AvailableNow
    // + append mode, completed windows are emitted
    val n = spark.sql("SELECT count(*) FROM host_stats").head().getLong(0)
    assert(n > 0, "some completed windows must be emitted")
    spark.sql("DROP TABLE IF EXISTS host_stats")
  }
}
