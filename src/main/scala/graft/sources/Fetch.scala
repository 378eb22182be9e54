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
    * inside the task from the serializable factory. Politeness is
    * upstream data layout (wave scheduling), not sleeps here. Failed
    * files (404) yield null bytes; exhausted retries fail the task so
    * Spark's task retry applies on top, exactly once per level.
    */
  def fetchBatches(batches: DataFrame, transportFactory: () => Transport,
                   retries: Int = 3, delayMs: Long = 1000L): DataFrame = {
    val spark = batches.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    batches
      .select("file_name", "range_start", "range_end")
      .repartition(col("file_name"))
      .mapPartitions { it =>
        val transport = transportFactory()
        // group consecutive same-file rows: ranges of one file fetched
        // in one call, like the reference's multi-range requests
        val rows = it.toArray
        val byFile = mutable.LinkedHashMap
          .empty[String, mutable.ArrayBuffer[(Long, Long)]]
        rows.foreach { r =>
          val f = r.getString(0)
          byFile.getOrElseUpdate(f, mutable.ArrayBuffer.empty) +=
            ((r.getLong(1), r.getLong(2)))
        }
        byFile.iterator.flatMap { case (f, rs) =>
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
