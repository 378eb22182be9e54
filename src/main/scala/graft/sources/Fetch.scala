package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Ranged-fetch retry semantics (cc_corpus/download.py:23–139,
  * scripts/download_pages.py:156–203) as a deterministic, testable state
  * machine. The NETWORK itself is sandbox-swapped per the brief — the
  * `Transport` below is the seam where an HTTP/S3 client plugs in — but
  * everything the reference's loop decides is real and spec-verified:
  *
  *   - `retries` attempts total; a transport exception retries
  *     immediately (no sleep), matching download.py:72–75;
  *   - 206 returns the range parts;
  *   - 200 means the server ignored the Range header — the reference
  *     LOGS, sleeps attempt#*delay and RETRIES (download.py:90–93);
  *   - 404 short-circuits to one `None` per requested range, NO retry
  *     (download.py:94–96);
  *   - any other status sleeps attempt#*delay and retries — LINEAR
  *     backoff, `(orig_retry_left - retry_left) * delay_period`
  *     (download.py:97–101);
  *   - exhausted attempts surface as `FetchExhausted`, the analogue of
  *     DownloadError (download.py:103).
  *
  * The sleeper is injected so tests assert the exact backoff sequence
  * instead of wall-clocking it.
  */
object Fetch {

  /** One transport attempt's outcome (the HTTP status cases the
    * reference distinguishes). A transport may also throw.
    */
  sealed trait Response
  /** 206: one byte-array per requested range. */
  final case class Partial(parts: Seq[Array[Byte]]) extends Response
  /** 200: server ignored the Range header (reference retries). */
  final case class Full(body: Array[Byte]) extends Response
  /** 404. */
  case object NotFound extends Response
  /** Any other status. */
  final case class HttpError(code: Int) extends Response

  /** (fileOrKey, ranges as (offset, length)) => Response. One instance
    * per executor thread mirrors the reference's per-thread sessions.
    */
  type Transport = (String, Seq[(Long, Long)]) => Response

  final case class FetchExhausted(url: String, attempts: Int)
    extends RuntimeException(
      s"could not download ranges from $url after $attempts attempts")

  /** The reference's download_ranges loop. Returns one Option per
    * requested range (None only from the 404 path).
    */
  def fetchRanges(url: String, ranges: Seq[(Long, Long)],
                  retries: Int, delayMs: Long,
                  transport: Transport,
                  sleeper: Long => Unit = Thread.sleep)
      : Seq[Option[Array[Byte]]] = {
    var attempt = 0
    while (attempt < retries) {
      attempt += 1
      val resp =
        try transport(url, ranges)
        catch { case scala.util.control.NonFatal(_) => null } // retry, no sleep
      resp match {
        case Partial(parts) if parts.length == ranges.length =>
          return parts.map(Option(_))
        case Partial(_) => // malformed multipart: retry (download.py:84–87)
          ()
        case NotFound =>
          return ranges.map(_ => None)
        case Full(_) | HttpError(_) =>
          // deliberately sleeps on the LAST attempt too before raising:
          // download.py:92/101 `time.sleep(...)` + `continue` runs even
          // when retry_left just hit 0 (the while-else then raises), and
          // this loop is byte-faithful to that backoff sequence
          sleeper(attempt * delayMs)
        case null => ()
      }
    }
    throw FetchExhausted(url, retries)
  }

  private val outSchema = StructType(Seq(
    StructField("file_name", StringType),
    StructField("range_start", LongType),
    StructField("range_end", LongType),
    StructField("bytes", BinaryType)))

  /** Distributed fetch of coalesced range batches (the O2 output:
    * file_name, range_start, range_end). One Transport per PARTITION —
    * the Spark analogue of the reference's per-thread sessions — built
    * inside the task from the serializable factory. Failed files (404)
    * yield null bytes; exhausted retries fail the task so Spark's task
    * retry applies on top, exactly once per level.
    *
    * Politeness is upstream data layout (wave scheduling), and with
    * `notBeforeCol` set it is ENFORCED here, not advisory: rows carry
    * the `not_before_epoch` that Frontier.scheduleWaves computed, the
    * partition processes its work in not_before order, and each fetch
    * call waits (injectable `sleeper`, like the retry loop's) until the
    * injectable `clock` (epoch seconds) reaches the group's barrier.
    * Work units become (file, not_before) groups — ranges of one file
    * in one wave still go out as a single multi-range request; ranges
    * of a later wave wait for their wave even when the file matches.
    * With the default wall clock this is exactly the per-host delay
    * budget: wave w of a host fetches no earlier than t0 + (w-1)·delay.
    */
  def fetchBatches(batches: DataFrame, transportFactory: () => Transport,
                   retries: Int = 3, delayMs: Long = 1000L,
                   notBeforeCol: Option[String] = None,
                   clock: () => Long = () => System.currentTimeMillis() / 1000L,
                   sleeper: Long => Unit = Thread.sleep): DataFrame = {
    val spark = batches.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val selected = notBeforeCol match {
      case Some(nb) => batches
        .select(col("file_name"), col("range_start"), col("range_end"),
                col(nb).cast("long").as("__nb"))
      case None => batches
        .select(col("file_name"), col("range_start"), col("range_end"),
                lit(Long.MinValue).as("__nb"))
    }
    val enforce = notBeforeCol.isDefined
    selected
      .repartition(col("file_name"))
      .mapPartitions { it =>
        val transport = transportFactory()
        // group rows into (file, not_before) work units: ranges of one
        // file in one wave fetched in one call, like the reference's
        // multi-range requests
        val rows = it.toArray
        val byUnit = mutable.LinkedHashMap
          .empty[(String, Long), mutable.ArrayBuffer[(Long, Long)]]
        rows.foreach { r =>
          val f = r.getString(0)
          val nb = if (enforce) r.getLong(3) else Long.MinValue
          byUnit.getOrElseUpdate((f, nb), mutable.ArrayBuffer.empty) +=
            ((r.getLong(1), r.getLong(2)))
        }
        // earliest wave first; insertion order breaks not_before ties
        val units =
          if (enforce) byUnit.toSeq.sortBy { case ((f, nb), _) => nb }
          else byUnit.toSeq
        units.iterator.flatMap { case ((f, nb), rs) =>
          if (enforce) {
            val now = clock()
            if (now < nb) sleeper((nb - now) * 1000L)
          }
          val ranges = rs.map { case (s, e) => (s, e - s) }.toSeq
          val parts = fetchRanges(f, ranges, retries, delayMs, transport)
          rs.iterator.zip(parts.iterator).map { case ((s, e), body) =>
            Row(f, s, e, body.orNull)
          }
        }
      }(enc)
  }

  /** Deterministic local-store transport (the sandbox's stand-in for
    * HTTP/S3): serves ranges out of an in-memory file map, optionally
    * failing the first `failFirst` attempts per file to exercise the
    * retry path end-to-end.
    */
  def storeTransport(store: Map[String, Array[Byte]],
                     failFirst: Int = 0): Transport = {
    val attempts = mutable.HashMap.empty[String, Int]
    (file, ranges) => {
      val n = attempts.updateWith(file)(c => Some(c.getOrElse(0) + 1)).get
      if (n <= failFirst) HttpError(503)
      else store.get(file) match {
        case None => NotFound
        case Some(bytes) => Partial(ranges.map { case (off, len) =>
          java.util.Arrays.copyOfRange(
            bytes, off.toInt, math.min(bytes.length, (off + len).toInt))
        })
      }
    }
  }
}
