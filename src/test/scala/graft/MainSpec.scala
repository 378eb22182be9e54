package graft

import graft.fixtures.{CrawlFixtures, DocFixtures}
import graft.functions.Urls
import graft.state.Snapshots
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The spark-submit entry point, driven exactly as a cluster launch
  * would (args in, snapshots out) — embedded against the shared test
  * session, which Main must reuse and must NOT stop.
  */
class MainSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("corpus command runs/resumes the 5-stage pipeline") {
    val in = Files.createTempDirectory("main-in").toString
    val table = Files.createTempDirectory("main-tbl").toString
    DocFixtures.docs(DocFixtures.Params(nDocs = 120, nHosts = 6))
      .zipWithIndex
      .map { case (d, i) => (Urls.host(d.doc_id), i.toLong, d.doc_id, d.spans) }
      .toDF("domain", "ord", "doc_id", "spans")
      .write.mode("overwrite").parquet(in)
    Main.main(Array("corpus", in, table, "5"))
    val chain = Snapshots.chain(table)
    assert(chain.length == 5)
    assert(chain.map(_.lineage).forall(_.startsWith("corpus stage=")))
    // the shared session survived Main
    assert(!spark.sparkContext.isStopped)
    // idempotent relaunch: resumes, commits nothing new
    Main.main(Array("corpus", in, table, "5"))
    assert(Snapshots.chain(table).length == 5)
  }

  test("frontier command commits one snapshot per launch") {
    val in = Files.createTempDirectory("main-fin").toString
    val table = Files.createTempDirectory("main-ftbl").toString
    val p = CrawlFixtures.Params(nRecords = 800, nUrls = 300, nHosts = 10)
    spark.createDataset(CrawlFixtures.rawLines(p)).toDF()
      .write.mode("overwrite").parquet(in)
    Main.main(Array("frontier", in, table, "d1"))
    val m = Snapshots.latest(table).get
    assert(m.snapshotId == 0 && m.metrics("n_scheduled") > 0)
    assert(m.lineage.contains("dump=d1"))
    Main.main(Array("frontier", in, table, "d2"))
    val m2 = Snapshots.latest(table).get
    assert(m2.snapshotId == 1 && m2.parentId == 0)
    // everything in dump d1 is already seen -> d2 schedules nothing
    assert(m2.metrics("n_scheduled") == 0)
  }

  test("curate command writes the funnel's survivors") {
    val in = Files.createTempDirectory("curate-in").toString
    val out = Files.createTempDirectory("curate-out").toString
    val goodPage = (1 to 8).map(i =>
      s"a perfectly fine sentence number $i here.").mkString("\n")
    val thinPage = "only one line survives here.\nnope"
    val loremPage = goodPage + "\nlorem ipsum."
    Seq(
      (1L, "en", goodPage), (2L, "en", goodPage), (3L, "en", thinPage),
      (4L, "en", loremPage), (5L, "de", goodPage))
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(in)
    Main.main(Array("curate", in, out, "5", "1/2"))
    val got = spark.read.parquet(out)
      .select("doc_id", "lang", "flesch").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // en: docs 1,2 pass C4 (3 thin, 4 lorem); top 1/2 -> ceil(1) = 1 doc
    // de: doc 5 passes and survives alone
    assert(got.size == 2)
    assert(got.contains((5L, "de")))
    assert(got.count(_._2 == "en") == 1)
    assert(!spark.sparkContext.isStopped)
  }
}
