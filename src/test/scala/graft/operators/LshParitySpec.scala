package graft.operators

import graft.TestSpark
import graft.fixtures.DocFixtures
import graft.functions.MinHashF
import graft.ref.RefLsh
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LshParitySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  val p     = DocFixtures.Params(nDocs = 600)
  val b     = MinHashF.optimalBands(0.9)
  lazy val docs = DocFixtures.docs(p).zipWithIndex.map { case (d, i) =>
    (d.doc_id, i.toLong, DocFixtures.textOf(d))
  }
  lazy val refDocs = docs.map { case (id, ord, text) =>
    RefLsh.minhash(id, ord, text, b)
  }

  def mhDf(partitions: Int): DataFrame =
    LshDedup.minhashed(
      docs.toDF("doc_id", "ord", "text").repartition(partitions), b)

  test("band count for t=0.9 picks the S-curve-closest divisor") {
    assert(b == 8, s"expected 8 bands for t=0.9/256 perms, got $b")
  }

  test("signatures are deterministic and similarity-ordered") {
    val s1 = MinHashF.signature("the quick brown fox jumps over the lazy dog")
    val s2 = MinHashF.signature("the quick brown fox jumps over the lazy dog")
    val s3 = MinHashF.signature("the quick brown fox jumps over the lazy cat")
    val s4 = MinHashF.signature("completely different text with nothing shared")
    assert(s1.toSeq == s2.toSeq)
    assert(MinHashF.estJaccard(s1, s3) > MinHashF.estJaccard(s1, s4))
    assert(MinHashF.estJaccard(s1, s2) == 1.0)
  }

  test("fixtures contain exact dups, near dups and id dups") {
    val texts = docs.map(_._3)
    assert(texts.distinct.size < texts.size, "exact text dups expected")
    val ids = docs.map(_._1)
    assert(ids.distinct.size < ids.size, "doc_id dups expected")
    val refKept = RefLsh.selfDedup(refDocs)
    assert(refKept.size < docs.size, "LSH must drop something")
    assert(refKept.size > docs.size / 2, "LSH must keep most docs")
  }

  test("A1 self-dedup matches the sequential reference replay") {
    val got = LshDedup.selfDedup(mhDf(5))
      .select("ord").as[Long].collect().toSet
    val exp = RefLsh.selfDedup(refDocs).map(_.ord).toSet
    assert(got == exp)
  }

  test("A1 self-dedup is partitioning-invariant") {
    val a = LshDedup.selfDedup(mhDf(1)).select("ord").as[Long].collect().toSet
    val c = LshDedup.selfDedup(mhDf(11)).select("ord").as[Long].collect().toSet
    assert(a == c)
  }

  test("A2 cross-dedup matches query-only reference") {
    val (first, second) = refDocs.partition(_.ord < 300)
    val seenKept = RefLsh.selfDedup(first)
    val exp      = RefLsh.crossDedup(second, seenKept).map(_.ord).toSet

    val mh       = mhDf(4)
    val firstMh  = mh.filter($"ord" < 300)
    val secondMh = mh.filter($"ord" >= 300)
    val seenDf   = LshDedup.selfDedup(firstMh)
      .join(firstMh, Seq("doc_id", "ord"))
      .select("doc_id", "ord", "bands")
    val got = LshDedup.crossDedup(secondMh, seenDf)
      .select("ord").as[Long].collect().toSet
    assert(got == exp)
  }

  test("J4 dedup_filter keeps exactly surviving doc_ids") {
    val mh        = mhDf(4)
    val survivors = LshDedup.selfDedup(mh)
    val corpus    = docs.toDF("doc_id", "ord", "text")
    val kept = LshDedup.dedupFilter(corpus, survivors)
    val expIds = RefLsh.selfDedup(refDocs).map(_.docId).toSet
    assert(kept.select("doc_id").as[String].collect().toSet == expIds)
    // row-level: all rows whose doc_id survived are kept (semi-join)
    assert(kept.count() == corpus.filter($"doc_id".isin(expIds.toSeq: _*)).count())
  }

  test("connected components: chain edges produce same components as cliques") {
    // tiny handcrafted graph: bucket {1,2,3}, bucket {3,4}, singleton 9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L))
      .toDF("src", "dst")
    val comps = LshDedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(1L) == comps(4L))
    assert(comps(7L) == comps(8L))
    assert(comps(1L) != comps(7L))
  }

  test("connected components: long chain (pointer-jump worst case) " +
       "converges and labels correctly — both solver paths") {
    // a 1500-node path is the worst case for min-label + pointer jumping
    // (diameter 1500 -> needs ~log2 iterations); everything must land in
    // one component labeled by the chain head
    val n = 1500
    val edges = (0 until n - 1).map(i => (i.toLong, i.toLong + 1))
      .toDF("src", "dst")
    // local union-find path (default threshold)
    val compsL = LshDedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(compsL.size == n)
    assert(compsL.values.toSet == Set(0L), "single component labeled 0")
    // distributed min-label/pointer-jump path (threshold forced to 0)
    val compsD = LshDedup.connectedComponents(edges, localThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(compsD == compsL, "both solver paths must agree exactly")
  }

  test("connected components: hitting maxIter without convergence fails " +
       "loudly instead of shipping wrong labels") {
    val edges = (0 until 200).map(i => (i.toLong, i.toLong + 1))
      .toDF("src", "dst")
    intercept[IllegalStateException] {
      LshDedup.connectedComponents(edges, maxIter = 1, localThreshold = 0)
    }
  }

  test("dedupRepresentatives: best-quality doc survives its component, " +
       "first-wins does not decide") {
    val dup = (1 to 40).map(i => s"token$i").mkString(" ")
    val docs = Seq(
      // ords 1,2,3 are one near-dup family; 2 is the LONGEST
      (1L, dup), (2L, dup + " extra"), (3L, dup),
      // 9 is a singleton
      (9L, "a completely different document about nothing shared at all"))
      .map { case (o, t) => (s"d$o", o, t) }.toDF("doc_id", "ord", "text")
    val quality = docs.select(col("ord"),
      length(col("text")).cast("long").as("q"))
    val out = LshDedup.dedupRepresentatives(
        LshDedup.minhashed(docs, b = 16), quality)
      .collect()
      .map(r => r.getAs[Long]("ord") ->
        ((r.getAs[Long]("comp"), r.getAs[Boolean]("kept")))).toMap
    assert(out(1L)._1 == out(2L)._1 && out(2L)._1 == out(3L)._1)
    assert(out(2L)._2, "longest member must be the representative")
    assert(!out(1L)._2 && !out(3L)._2,
      "first-seen must lose to a better-quality later doc")
    assert(out(9L)._2, "singletons keep themselves")
  }
}
