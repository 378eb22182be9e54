package graft.state

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SnapshotTravelSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def commitBatch(table: String, urls: Seq[String]): Long = {
    val (id, dataDir, _) = Snapshots.stage(table)
    urls.toDF("url").coalesce(1).write.mode("overwrite")
      .parquet(dataDir.toString)
    Snapshots.commit(table, id, Map("n" -> urls.length.toLong),
      lineage = s"test batch $id")
    id
  }

  test("readAsOf sees exactly the deltas up to the asked snapshot") {
    val t = Files.createTempDirectory("snap-travel").toString
    commitBatch(t, Seq("a", "b"))
    commitBatch(t, Seq("c"))
    commitBatch(t, Seq("d", "e"))
    assert(Snapshots.readAsOf(spark, t, 0).as[String].collect().toSet ==
      Set("a", "b"))
    assert(Snapshots.readAsOf(spark, t, 1).as[String].collect().toSet ==
      Set("a", "b", "c"))
    assert(Snapshots.readAsOf(spark, t, 2).as[String].collect().toSet ==
      Set("a", "b", "c", "d", "e"))
    intercept[IllegalArgumentException](Snapshots.chainAsOf(t, 9))
  }

  test("rollback moves the head; recommit continues from there") {
    val t = Files.createTempDirectory("snap-rollback").toString
    commitBatch(t, Seq("a"))
    commitBatch(t, Seq("b"))
    commitBatch(t, Seq("c"))
    val head = Snapshots.rollback(t, 1)
    assert(head.snapshotId == 1L)
    assert(Snapshots.latest(t).map(_.snapshotId).contains(1L))
    // latest read no longer sees the rolled-back delta
    val seen = spark.read.parquet(
      Snapshots.chain(t).map(m => s"$t/${m.dataPath}"): _*)
      .as[String].collect().toSet
    assert(seen == Set("a", "b"))
    // next commit takes id 2 with parent 1, and stage() purged the
    // orphaned snap-2 data before reuse
    val id = commitBatch(t, Seq("z"))
    assert(id == 2L)
    val m = Snapshots.latest(t).get
    assert(m.parentId == 1L)
    assert(Snapshots.readAsOf(spark, t, 2).as[String].collect().toSet ==
      Set("a", "b", "z"))
  }
}
