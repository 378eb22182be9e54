package graft.state

import java.nio.file.{Files, Paths}

import graft.TestSpark
import graft.fixtures.CrawlFixtures
import graft.model.RawIndexLine
import graft.operators.FrontierJob
import org.scalatest.funsuite.AnyFunSuite

class StateSpec extends AnyFunSuite {

  test("cuckoo filter: insert/lookup/delete laws, no false negatives") {
    val cf = CuckooFilter.forCapacity(10000)
    val keys = (0L until 8000L).map(CrawlFixtures.mix)
    keys.foreach(k => assert(cf.insert(k), s"insert failed at load ${cf.loadFactor}"))
    keys.foreach(k => assert(cf.contains(k), "false negative"))
    // false positive rate on fresh keys is tiny
    val fresh = (100000L until 120000L).map(CrawlFixtures.mix)
    val fp = fresh.count(cf.contains)
    assert(fp < 50, s"fp rate too high: $fp/20000")
    // delete removes membership (for uniquely-inserted keys)
    val del = keys.take(1000)
    del.foreach(k => assert(cf.delete(k)))
    val stillThere = del.count(cf.contains)
    assert(stillThere < 10, s"deletes did not take: $stillThere")
    assert(cf.size == 7000)
  }

  test("cuckoo filter: deterministic serialization roundtrip") {
    val a = CuckooFilter.forCapacity(1000)
    val b = CuckooFilter.forCapacity(1000)
    (0L until 700L).map(CrawlFixtures.mix).foreach { k =>
      a.insert(k); b.insert(k)
    }
    assert(a.toBytes.toSeq == b.toBytes.toSeq, "same inserts, same bytes")
    val c = CuckooFilter.fromBytes(a.toBytes)
    assert((0L until 700L).map(CrawlFixtures.mix).forall(c.contains))
    assert(c.size == a.size)
  }

  test("cuckoo chain grows past the first segment's capacity") {
    val chain = CuckooChain.forCapacity(100)
    val keys  = (0L until 5000L).map(CrawlFixtures.mix)
    keys.foreach(k => assert(chain.insert(k), s"insert must never fail: $k"))
    assert(chain.numSegments > 1, "overflow must append segments")
    assert(keys.forall(chain.contains), "no false negatives across segments")
    val rt = CuckooChain.fromBytes(chain.toBytes)
    assert(keys.forall(rt.contains))
    assert(rt.size == chain.size && rt.numSegments == chain.numSegments)
    assert(rt.delete(keys.head))
  }

  test("cuckoo insert at kick exhaustion retains the key and never " +
       "double-inserts via the chain (no phantom membership after delete)") {
    // force kick exhaustion: tiny filter, keys well past capacity
    val cf = CuckooFilter.forCapacity(16)
    val keys = (0L until 2000L).map(CrawlFixtures.mix)
    var closedAt = -1
    var i = 0
    while (i < keys.length && closedAt < 0) {
      if (!cf.insert(keys(i))) closedAt = i
      i += 1
    }
    assert(closedAt > 0, "filter must eventually close")
    // every key that insert() returned true for must be a member —
    // including the one whose kick loop exhausted (stash-as-success)
    keys.take(closedAt).foreach(k => assert(cf.contains(k), "false negative"))
    // chain: insert each key exactly once; a key must be deletable with
    // ONE delete (the r2 bug double-inserted the exhausting key, so one
    // delete left a phantom copy behind)
    val chain = CuckooChain.forCapacity(16)
    val ck = (0L until 3000L).map(CrawlFixtures.mix)
    ck.foreach(chain.insert)
    assert(chain.size == ck.length.toLong,
           s"count drift: ${chain.size} != ${ck.length}")
    ck.foreach(chain.delete)
    val phantom = ck.count(chain.contains)
    // residual hits are fingerprint collisions only, not stuck duplicates
    assert(phantom < 30, s"phantom membership after delete: $phantom/3000")
  }

  test("cuckoo chain loads a legacy bare-filter blob (CUKF magic)") {
    val cf = CuckooFilter.forCapacity(500)
    val keys = (0L until 400L).map(CrawlFixtures.mix)
    keys.foreach(cf.insert)
    val chain = CuckooChain.fromBytes(cf.toBytes) // pre-chain snapshot blob
    assert(chain.numSegments == 1)
    assert(keys.forall(chain.contains))
    assert(chain.size == cf.size)
  }

  test("compaction bounds FP rate back to single-filter level") {
    // grow a chain through several segments, measure FP rate, then
    // rebuild right-sized from the key set (what compactDistributed does
    // per partition) and require the compacted FP rate to drop to the
    // single-filter ballpark
    val keys = (0L until 20000L).map(CrawlFixtures.mix)
    val grown = CuckooChain.forCapacity(256)
    keys.foreach(grown.insert)
    assert(grown.numSegments > 3, s"need a long chain, got ${grown.numSegments}")
    val fresh = (1000000L until 1100000L).map(CrawlFixtures.mix)
    val fpGrown = fresh.count(grown.contains)

    val sorted = keys.toArray; java.util.Arrays.sort(sorted)
    val compact = CuckooChain.forCapacity(sorted.length)
    sorted.foreach(compact.insert)
    assert(compact.numSegments == 1, "right-sized rebuild must be 1 segment")
    assert(keys.forall(compact.contains), "compaction lost a key")
    val fpCompact = fresh.count(compact.contains)
    assert(fpCompact * 2 < fpGrown,
           s"compaction should materially cut FPs: $fpCompact vs $fpGrown")
    // and byte-determinism of the rebuild
    val compact2 = CuckooChain.forCapacity(sorted.length)
    sorted.foreach(compact2.insert)
    assert(compact.toBytes.toSeq == compact2.toBytes.toSeq)
  }

  test("A3 per-domain size metrics land in snapshot manifests") {
    val spark = TestSpark.spark
    import spark.implicits._
    // skewed shape: one domain owns 60 of 100 docs
    val docs = ((0 until 60).map(i => ("mega.example.com", i)) ++
                (0 until 40).map(i => (s"d${i % 8}.example.com", i)))
      .toDF("domain", "ord")
    val m = graft.operators.FrequentParagraphs.domainSizeMetrics(docs)
    assert(m("n_domains") == 9L)
    assert(m("max_domain_docs") == 60L)
    assert(m("n_docs") == 100L)
    val table = Files.createTempDirectory("pdata-snap").toString
    val (id, _, _) = Snapshots.stage(table)
    Snapshots.commit(table, id, m, "pdata collect metrics")
    val got = Snapshots.latest(table).get.metrics
    assert(got("max_domain_docs") == 60L, s"metric missing from manifest: $got")
    assert(got("n_domains") == 9L)
  }

  test("distributed cuckoo IO goes through the Hadoop FS API (file: URI)") {
    // exercises the String/URI entry points end-to-end: update with no
    // previous state, carry-forward + update from a previous URI dir,
    // load and compact through the same `file:` filesystem. On a cluster
    // the same code paths address hdfs:/s3a: via the session Hadoop conf.
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("cuckoo-hfs").toString
    val uri = "file://" + dir
    val hashes = (0L until 5000L).map(CrawlFixtures.mix)
    val stats = UrlSeenState.updateDistributed(
      spark, hashes.toDF("h"), None: Option[String], s"$uri/s1",
      partitions = 4, capacityPerPartition = 1 << 12)
    assert(stats.values.map(_.inserted).sum == 5000L)
    val more = (5000L until 6000L).map(CrawlFixtures.mix)
    UrlSeenState.updateDistributed(
      spark, more.toDF("h"), Some(s"$uri/s1"), s"$uri/s2",
      partitions = 4, capacityPerPartition = 1 << 12)
    val loaded = UrlSeenState.load(s"$uri/s2")
    assert((hashes ++ more).forall(loaded.contains))
    // compact in place through the URI as well; membership preserved
    val segs = UrlSeenState.compactDistributed(
      spark, (hashes ++ more).toDF("h"), s"$uri/s2",
      partitions = 4, capacityPerPartition = 1 << 12)
    assert(segs.values.forall(_ == 1))
    val compacted = UrlSeenState.load(s"$uri/s2")
    assert((hashes ++ more).forall(compacted.contains))
  }

  test("compactDistributed rebuilds grown chains to one segment, " +
       "membership preserved") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir1 = Files.createTempDirectory("cuckoo-u").toString
    val dir2 = Files.createTempDirectory("cuckoo-c").toString
    val hashes = (0L until 40000L).map(CrawlFixtures.mix)
    // tiny per-partition capacity forces multi-segment chains
    val stats = UrlSeenState.updateDistributed(
      spark, hashes.toDF("h"), None, Paths.get(dir1),
      partitions = 4, capacityPerPartition = 256)
    assert(stats.values.exists(_.segments > 2), s"need grown chains: $stats")
    val loaded = UrlSeenState.load(Paths.get(dir1))
    assert(hashes.forall(loaded.contains))

    // compact from the authoritative key set into the same layout
    java.nio.file.Files.list(Paths.get(dir1)).forEach(p =>
      Files.copy(p, Paths.get(dir2).resolve(p.getFileName.toString)))
    val segs = UrlSeenState.compactDistributed(
      spark, hashes.toDF("h"), Paths.get(dir2),
      partitions = 4, capacityPerPartition = 256)
    assert(segs.values.forall(_ == 1), s"compaction must right-size: $segs")
    val compacted = UrlSeenState.load(Paths.get(dir2))
    assert(hashes.forall(compacted.contains), "compaction lost a key")
    assert(compacted.parts.map(_.numSegments).forall(_ == 1))
    // FP rate materially better than the grown chain's
    val fresh = (1000000L until 1040000L).map(CrawlFixtures.mix)
    val fpGrown   = fresh.count(loaded.contains)
    val fpCompact = fresh.count(compacted.contains)
    assert(fpCompact * 2 < fpGrown + 100,
           s"fp not reduced: $fpCompact vs $fpGrown")
  }

  test("snapshot log: stage/commit/latest/parent chain + commit race") {
    val dir = Files.createTempDirectory("snaptest").toString
    assert(Snapshots.latest(dir).isEmpty)
    val (id0, d0, _) = Snapshots.stage(dir)
    Files.writeString(d0.resolve("x.txt"), "data0")
    val m0 = Snapshots.commit(dir, id0, Map("rows" -> 10L), "first")
    assert(m0.snapshotId == 0 && m0.parentId == -1)
    val (id1, d1, _) = Snapshots.stage(dir)
    Files.writeString(d1.resolve("x.txt"), "data1")
    val m1 = Snapshots.commit(dir, id1, Map("rows" -> 20L), "second")
    assert(m1.parentId == 0)
    val latest = Snapshots.latest(dir).get
    assert(latest.snapshotId == 1 && latest.metrics("rows") == 20L)
    // double-commit of same id must fail
    intercept[IllegalStateException] {
      Snapshots.commit(dir, id1, Map.empty, "dup")
    }
  }

  test("stage() cleans orphan staging from a crashed pre-commit attempt") {
    val dir = Files.createTempDirectory("snaporphan").toString
    // run 1 stages snap-0, writes data + a state blob, DIES before commit
    val (id0, d0, s0) = Snapshots.stage(dir)
    Files.writeString(d0.resolve("orphan.parquet"), "uncommitted delta")
    Files.writeString(s0.resolve("part-00003.cuckoo"), "uncommitted inserts")
    // run 2 resumes: latest() is still empty, stage() hands out the SAME
    // id — the orphan files must be GONE, or the untouched-partition
    // carry-forward would smuggle never-committed inserts into snap-0
    val (id1, d1, s1) = Snapshots.stage(dir)
    assert(id1 == id0)
    assert(!Files.exists(d1.resolve("orphan.parquet")))
    assert(!Files.exists(s1.resolve("part-00003.cuckoo")))
    assert(Files.list(d1).count() == 0 && Files.list(s1).count() == 0)
    // a committed snapshot's dirs are never touched by later stage calls
    Files.writeString(d1.resolve("real.parquet"), "committed delta")
    Snapshots.commit(dir, id1, Map("rows" -> 1L), "c")
    val (id2, _, _) = Snapshots.stage(dir)
    assert(id2 == id1 + 1)
    assert(Files.exists(d1.resolve("real.parquet")))
  }

  test("frontier job: two batches, resume from committed snapshot") {
    val spark = TestSpark.spark
    import spark.implicits._
    val table = Files.createTempDirectory("frontier").toString
    val p     = CrawlFixtures.Params(nRecords = 1200, nUrls = 500, nHosts = 20)
    val lines = CrawlFixtures.rawLines(p)
    val (day1, day2) = lines.partition(_.file_ord < 3)

    val r1 = FrontierJob.runBatch(spark, day1.toDF(), table, dumpId = "d1")
    assert(r1.manifest.snapshotId == 0)
    assert(r1.manifest.metrics("n_scheduled") > 0)
    val scheduled1 = r1.batches.select("url").distinct().as[String].collect().toSet

    // "crash" happens here: nothing in-flight, resume = latest snapshot.
    // The seen set is append-only: the reader view is the union of the
    // manifest chain's delta paths.
    def seenSet(): Set[String] = {
      val paths = Snapshots.chain(table).map(m => s"$table/${m.dataPath}")
      spark.read.parquet(paths: _*).as[String].collect().toSet
    }
    val resumed = Snapshots.latest(table).get
    assert(resumed.snapshotId == 0)
    val seen1 = seenSet()

    val r2 = FrontierJob.runBatch(spark, day2.toDF(), table, dumpId = "d2")
    assert(r2.manifest.snapshotId == 1 && r2.manifest.parentId == 0)
    val scheduled2 = r2.batches.select("url").distinct().as[String].collect().toSet

    // day-2 schedule must not contain anything already seen on day 1
    assert(scheduled2.intersect(seen1).isEmpty)
    // seen set grows monotonically across the snapshot chain
    val seen2 = seenSet()
    assert(seen1.subsetOf(seen2))
    assert(scheduled2.subsetOf(seen2 -- seen1))
    assert(Snapshots.latest(table).get.metrics("n_seen_urls") == seen2.size)

    // cuckoo state mirrors the table across resume
    val state = UrlSeenState.load(
      Paths.get(table, Snapshots.latest(table).get.statePath))
    val hashes = (scheduled1 ++ scheduled2).toSeq
    val present = hashes.count(u => state.contains(
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(u),
        org.apache.spark.sql.types.StringType, 42L)))
    assert(present == hashes.size, "cuckoo state must contain all winners")
  }

  test("cuckoo batch ordering in crawl order matches (warc, offset)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val table = Files.createTempDirectory("frontier2").toString
    val p     = CrawlFixtures.Params(nRecords = 600, nUrls = 300, nHosts = 10)
    val r = FrontierJob.runBatch(spark, CrawlFixtures.rawLines(p).toDF(), table)
    val rows = r.batches.orderBy("ord")
      .select("warc", "offset").as[(String, Long)].collect()
    assert(rows.toSeq == rows.sortBy(x => (x._1, x._2)).toSeq)
  }
}
