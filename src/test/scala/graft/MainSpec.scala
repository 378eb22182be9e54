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
}
