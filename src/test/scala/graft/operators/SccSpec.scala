package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SccSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    HostRank.scc(edges.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("two cycles joined by a one-way bridge stay separate components") {
    // 1->2->3->1 (cycle A), 4->5->4 (cycle B), bridge 3->4 one-way
    val m = run(Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 4L),
                    (3L, 4L)))
    assert(m(1L) == (1L, 3L) && m(2L) == (1L, 3L) && m(3L) == (1L, 3L))
    assert(m(4L) == (4L, 2L) && m(5L) == (4L, 2L))
  }

  test("a DAG is all singleton components") {
    val m = run(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(m.values.forall(_._2 == 1L))
    assert(m.keySet == Set(1L, 2L, 3L, 4L))
    m.foreach { case (h, (id, _)) => assert(id == h) }
  }

  test("long cycle needs log-many doubling rounds, still exact") {
    // 12-cycle: diameter 11, closure converges by doubling
    val edges = (0L until 12L).map(i => (i, (i + 1) % 12))
    val m = run(edges)
    assert(m.size == 12)
    assert(m.values.forall(_ == (0L, 12L)))
  }

  test("back-edge turns a chain prefix into one component") {
    // 0->1->2->3->4 with back-edge 3->0: {0,1,2,3} SCC, 4 singleton
    val m = run(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (3L, 0L)))
    assert(Set(0L, 1L, 2L, 3L).forall(h => m(h) == (0L, 4L)))
    assert(m(4L) == (4L, 1L))
  }
}
