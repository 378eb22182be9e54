package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** Shared-JVM state for the wave-barrier spec: object members are
  * resolved by module reference after closure deserialization (local
  * mode = one JVM), so the executor-side fake clock and call log are
  * the same instances the assertions read.
  */
object WaveClockLog {
  val clock = new java.util.concurrent.atomic.AtomicLong(0L)
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[(Long, List[Long])]()
  def reset(): Unit = { clock.set(0L); calls.clear() }
}

/** The download.py:23–139 retry loop, case by case, with an injected
  * sleeper so the backoff SEQUENCE is asserted, not wall-clocked.
  */
class FetchSpec extends AnyFunSuite {

  private def sleeps(buf: mutable.ArrayBuffer[Long]): Long => Unit =
    ms => buf += ms

  test("206 returns parts on the first attempt, no sleeps") {
    val slept = mutable.ArrayBuffer.empty[Long]
    val got = Fetch.fetchRanges("f", Seq((0L, 2L), (5L, 3L)), retries = 3,
      delayMs = 10, (_, rs) =>
        Fetch.Partial(rs.map { case (o, l) => Array.fill(l.toInt)(o.toByte) }),
      sleeps(slept))
    assert(got.map(_.get.toSeq) == Seq(Seq[Byte](0, 0), Seq[Byte](5, 5, 5)))
    assert(slept.isEmpty)
  }

  test("404 short-circuits to one None per range, no retries") {
    var calls = 0
    val slept = mutable.ArrayBuffer.empty[Long]
    val got = Fetch.fetchRanges("gone", Seq((0L, 1L), (1L, 1L), (2L, 1L)),
      retries = 5, delayMs = 10,
      (_, _) => { calls += 1; Fetch.NotFound }, sleeps(slept))
    assert(got == Seq(None, None, None))
    assert(calls == 1 && slept.isEmpty)
  }

  test("misc HTTP errors back off LINEARLY (attempt# * delay) then succeed") {
    var calls = 0
    val slept = mutable.ArrayBuffer.empty[Long]
    val got = Fetch.fetchRanges("flaky", Seq((0L, 1L)), retries = 5,
      delayMs = 100,
      (_, rs) => {
        calls += 1
        if (calls <= 3) Fetch.HttpError(503)
        else Fetch.Partial(rs.map(_ => Array[Byte](42)))
      }, sleeps(slept))
    assert(got.head.get.toSeq == Seq[Byte](42))
    // download.py:97–101: sleep (orig_retry_left - retry_left) * delay
    assert(slept.toSeq == Seq(100L, 200L, 300L))
  }

  test("200 (range ignored) retries with backoff like a misc error") {
    var calls = 0
    val slept = mutable.ArrayBuffer.empty[Long]
    Fetch.fetchRanges("no-range", Seq((0L, 1L)), retries = 3, delayMs = 7,
      (_, rs) => {
        calls += 1
        if (calls == 1) Fetch.Full(Array[Byte](1, 2, 3))
        else Fetch.Partial(rs.map(_ => Array[Byte](9)))
      }, sleeps(slept))
    assert(slept.toSeq == Seq(7L))
  }

  test("transport exceptions retry immediately with NO sleep") {
    var calls = 0
    val slept = mutable.ArrayBuffer.empty[Long]
    val got = Fetch.fetchRanges("throwy", Seq((0L, 1L)), retries = 4,
      delayMs = 50,
      (_, rs) => {
        calls += 1
        if (calls <= 2) throw new java.io.IOException("reset")
        else Fetch.Partial(rs.map(_ => Array[Byte](7)))
      }, sleeps(slept))
    assert(got.head.get.toSeq == Seq[Byte](7))
    assert(slept.isEmpty, "download.py:72–75 retries exceptions without sleeping")
  }

  test("exhausted retries raise FetchExhausted (DownloadError analogue)") {
    val slept = mutable.ArrayBuffer.empty[Long]
    val e = intercept[Fetch.FetchExhausted] {
      Fetch.fetchRanges("dead", Seq((0L, 1L)), retries = 3, delayMs = 10,
        (_, _) => Fetch.HttpError(500), sleeps(slept))
    }
    assert(e.attempts == 3)
    assert(slept.toSeq == Seq(10L, 20L, 30L))
  }

  test("distributed fetchBatches: per-partition transport, 404 -> null bytes") {
    val spark = TestSpark.spark
    import spark.implicits._
    val store = Map(
      "warc-a" -> (0 until 100).map(_.toByte).toArray,
      "warc-b" -> (0 until 50).map(i => (i * 2).toByte).toArray)
    val batches = Seq(
      ("warc-a", 0L, 10L), ("warc-a", 20L, 25L),
      ("warc-b", 5L, 8L), ("warc-missing", 0L, 4L)
    ).toDF("file_name", "range_start", "range_end")
    // failFirst = 1: every file's first attempt 503s -> the retry path
    // runs inside the executors too
    val got = Fetch.fetchBatches(batches,
        () => Fetch.storeTransport(store, failFirst = 1),
        retries = 3, delayMs = 0)
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
                 Option(r.getAs[Array[Byte]]("bytes")).map(_.toSeq)))
      .toSet
    assert(got == Set(
      ("warc-a", 0L, Some((0 until 10).map(_.toByte).toSeq)),
      ("warc-a", 20L, Some((20 until 25).map(_.toByte).toSeq)),
      ("warc-b", 5L, Some((5 until 8).map(i => (i * 2).toByte).toSeq)),
      ("warc-missing", 0L, None)))
  }

  test("fetchBatches enforces not_before_epoch as a wave barrier " +
       "(fake clock, emission order)") {
    val spark = TestSpark.spark
    import spark.implicits._
    WaveClockLog.reset()
    val store = Map("w" -> (0 until 100).map(_.toByte).toArray)
    // one file, three waves, deliberately OUT of wave order in the input
    val batches = Seq(
      ("w", 0L, 2L, 200L),  // wave 2
      ("w", 10L, 12L, 100L), // wave 1
      ("w", 20L, 22L, 100L), // wave 1 (same unit as above)
      ("w", 30L, 32L, 300L)  // wave 3
    ).toDF("file_name", "range_start", "range_end", "not_before_epoch")
    val rows = Fetch.fetchBatches(batches,
        () => (f, rs) => {
          WaveClockLog.calls.add((WaveClockLog.clock.get(),
            rs.map(_._1).toList))
          Fetch.Partial(rs.map { case (o, l) =>
            Array.fill(l.toInt)(o.toByte) })
        },
        retries = 1, delayMs = 0,
        notBeforeCol = Some("not_before_epoch"),
        clock = () => WaveClockLog.clock.get(),
        sleeper = ms => WaveClockLog.clock.addAndGet(ms / 1000L))
      .collect()
    assert(rows.length == 4)
    val calls = {
      val it = WaveClockLog.calls.iterator()
      val b = mutable.ArrayBuffer.empty[(Long, List[Long])]
      while (it.hasNext) b += it.next()
      b.toList
    }
    // one call per (file, wave), earliest wave first; every call happens
    // exactly when the fake clock reaches the wave's not_before
    assert(calls == List(
      (100L, List(10L, 20L)), (200L, List(0L)), (300L, List(30L))))
  }

  test("fetched bytes feed the existing WARC decode chain (S2 seam)") {
    val spark = TestSpark.spark
    import spark.implicits._
    // a two-member concatenated gzip "warc file"; ranged fetch pulls one
    // member, gzipMemberAt decodes it — the reference's fetch+decode unit
    def gz(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("UTF-8")); g.close()
      bos.toByteArray
    }
    val m1 = gz("record one"); val m2 = gz("record two")
    val file = m1 ++ m2
    val store = Map("crawl.warc.gz" -> file)
    val batches = Seq(
      ("crawl.warc.gz", 0L, m1.length.toLong),
      ("crawl.warc.gz", m1.length.toLong, file.length.toLong)
    ).toDF("file_name", "range_start", "range_end")
    val rows = Fetch.fetchBatches(batches,
        () => Fetch.storeTransport(store), retries = 1, delayMs = 0)
      .collect()
      .map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        new String(WarcGzip.gzipMembers(bytes).head, "UTF-8")
      }.toSet
    assert(rows == Set("record one", "record two"))
  }
}
