package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import graft.operators.FrequentParagraphs
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class FrequentStreamSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming A3 state converges to the batch collect() exactly") {
    // paragraph bands from a small pool so duplicates recur per domain;
    // every domain has docs in BOTH halves so the final trigger's
    // update set is the final state for all domains
    def bands(seed: Int): Seq[Long] =
      (0 until 4).map(b => ((seed * 31 + b * 17) % 7).toLong)
    val docs = (0 until 120).map { i =>
      val domain = s"d${i % 4}"
      val pb = (0 until (i % 3 + 1)).map(p => bands((i + p) % 9))
      (domain, i.toLong, s"u$i", pb)
    }
    val docsDf = docs.toDF("domain", "ord", "doc_id", "pbands")

    val want = FrequentParagraphs.collect(docsDf)
      .select("domain", "pdata_id", "bands", "score", "count")
      .as[(String, Int, Seq[Long], Double, Long)].collect().toSet

    // two ord-ordered micro-batches (file mod-times order the triggers)
    val dir = Files.createTempDirectory("freq-stream").toString
    val half = 60L
    docsDf.filter($"ord" < half).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/in")
    Thread.sleep(1100)
    docsDf.filter($"ord" >= half).coalesce(1)
      .write.mode("append").parquet(s"$dir/in")

    val stream = spark.readStream
      .schema(docsDf.schema)
      .option("maxFilesPerTrigger", 1)
      .option("latestFirst", "false")
      .parquet(s"$dir/in")
      .as[FrequentStream.PDocRow]

    val perBatch = scala.collection.mutable.Map
      .empty[Long, Set[(String, Int, Seq[Long], Double, Long)]]
    val q = FrequentStream.frequentUpdates(stream)
      .writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[FrequentStream.FrequentUpdate],
         id: Long) =>
          perBatch(id) = df.collect()
            .map(u => (u.domain, u.pdata_id, u.bands, u.score, u.count))
            .toSet
      }
      .start()
    q.awaitTermination(120000)

    // two files + maxFilesPerTrigger=1 must give >= 2 triggers — the
    // convergence claim is about state CONTINUATION across them
    assert(perBatch.size >= 2, s"expected >=2 micro-batches: ${perBatch.keys}")
    val got = perBatch(perBatch.keys.max)
    assert(got == want,
      s"missing=${want -- got}\nextra=${got -- want}")
  }
}
