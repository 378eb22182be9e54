package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Real source-format handling for the fetch path:
  *
  *  - **S3 multi-stream gzip** (cc_corpus/index.py:250–268): Common Crawl
  *    cluster index .gz files are CONCATENATED gzip members — one member
  *    per 3000-line cluster. `gzipMembers` loops an inflater over the
  *    remaining bytes exactly like the reference loops `decompressobj`
  *    over `unused_data`; `gzipMemberAt` decodes the single member at a
  *    (offset, length) byte range — the ranged-fetch decode (S2).
  *  - **S4 WARC record scan** (download_pages.py / warc usage): a WARC
  *    response record is `WARC/1.x` headers, a blank line, an HTTP
  *    response (status + headers), a blank line, the payload. CC WARCs
  *    store one gzip member per record, so (warc, offset, length) →
  *    `gzipMemberAt` → `parseWarcRecord` is the reference's fetch+decode
  *    unit, minus the network.
  */
object WarcGzip {

  // ---- WARC WRITING (the storage side of the crawl loop —
  //      download_pages.py's per-thread WARC shard, S9's payload) ----

  /** One spec-shaped WARC response record, gzip-compressed as its own
    * member (the Common Crawl convention: member boundary == record
    * boundary, which is also what keeps ranged fetch possible). The
    * inter-record CRLF separator stays OUTSIDE the member — our own
    * reader takes payload to end-of-record, and member framing is the
    * real delimiter. Fully deterministic: WARC-Record-ID is a name
    * UUID of (uri, epoch), the gzip header carries no mtime, and the
    * digest is sha-1 hex of the payload — byte-identical output for
    * identical input on any executor.
    */
  def buildWarcResponse(uri: String, epochSec: Long,
                        payload: Array[Byte],
                        status: Int = 200,
                        contentType: String = "text/html"): Array[Byte] = {
    val date = java.time.Instant.ofEpochSecond(epochSec).toString
    val http = (s"HTTP/1.1 $status OK\r\n" +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("US-ASCII")
    val recId = java.util.UUID.nameUUIDFromBytes(
      (uri + "@" + epochSec).getBytes("UTF-8"))
    val digest = java.security.MessageDigest.getInstance("SHA-1")
      .digest(payload).map("%02x".format(_)).mkString
    val head = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Record-ID: <urn:uuid:$recId>\r\n" +
      s"WARC-Payload-Digest: sha1:$digest\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length + payload.length}\r\n\r\n")
      .getBytes("US-ASCII")
    gzipOneMember(head ++ http ++ payload)
  }

  /** Deterministic single-member gzip (no mtime, no name — identical
    * bytes for identical input, so written shards are reproducible).
    */
  def gzipOneMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    val out = bos.toByteArray
    // GZIPOutputStream stamps no mtime (bytes 4-7 already zero) — keep
    // OS byte fixed too (some JDKs write 0, keep it that way)
    out(9) = 0
    out
  }

  val buildWarcResponseUdf = udf(
    (uri: String, epoch: Long, payload: Array[Byte]) =>
      buildWarcResponse(uri, epoch, payload))

  /** Index shard for written WARC records — the (url, surt, shard,
    * offset, length) table the ranged reader needs to fetch one record
    * back (the reference writes exactly this beside each WARC shard,
    * download_pages.py's per-thread index file; cluster.idx is its
    * merged form). Input rows: (shardCol, ordCol, urlCol, recCol =
    * the gzip-member bytes from buildWarcResponse). Offsets are a
    * cumulative window sum of member lengths within each shard in
    * `ordCol` order — one window, partitioned by shard (bounded by
    * shard size, never corpus skew).
    */
  def indexShards(records: DataFrame,
                  shardCol: String = "shard", ordCol: String = "ord",
                  urlCol: String = "url",
                  recCol: String = "rec"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(shardCol)).orderBy(asc(ordCol))
    records.select(col(shardCol), col(ordCol), col(urlCol),
        length(col(recCol)).cast("long").as("length"))
      .withColumn("offset",
        coalesce(sum(col("length")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(shardCol), col(ordCol), col(urlCol),
        graft.functions.Urls.surtKeyCol(
          graft.functions.Urls.hostCol(col(urlCol))).as("surt_key"),
        col("offset"), col("length"))
  }

  /** Whole-shard bytes: members concatenated in `ordCol` order — the
    * file a shard sink would write. Per-shard, so memory is bounded by
    * shard size (at corpus scale the sink streams; this form exists so
    * index offsets can be VERIFIED by re-reading ranges).
    */
  def shardBytes(records: DataFrame,
                 shardCol: String = "shard", ordCol: String = "ord",
                 recCol: String = "rec"): DataFrame =
    records.groupBy(col(shardCol))
      .agg(sort_array(collect_list(struct(col(ordCol).as("o"),
        col(recCol).as("r")))).as("rs"))
      .select(col(shardCol),
        concatMembersUdf(col("rs.r")).as("bytes"))

  private val concatMembersUdf = udf((members: Seq[Array[Byte]]) => {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach(out.write)
    out.toByteArray
  })

  /** Decode one gzip member from a byte range of a multi-member file. */
  def gzipMemberAt(bytes: Array[Byte], offset: Long, length: Long): Array[Byte] = {
    val slice = java.util.Arrays.copyOfRange(
      bytes, offset.toInt, (offset + length).toInt)
    decodeAll(slice)
  }

  /** All members of a concatenated-gzip buffer, one byte array each.
    * GZIPInputStream silently concatenates members (losing boundaries),
    * so members are split with a raw Inflater: parse each member's gzip
    * header by hand, inflate (nowrap), skip the 8-byte trailer, repeat —
    * the same walk the reference does with decompressobj/unused_data.
    */
  def gzipMembers(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    while (pos + 10 <= bytes.length) {
      pos = skipGzipHeader(bytes, pos)
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(bytes, pos, bytes.length - pos)
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](65536)
      while (!inf.finished()) {
        val n = inf.inflate(tmp)
        if (n > 0) buf.write(tmp, 0, n)
        else if (inf.needsInput() || inf.needsDictionary())
          throw new java.util.zip.ZipException("truncated gzip member")
      }
      out += buf.toByteArray
      pos += inf.getBytesRead.toInt + 8 // deflate stream + CRC32 + ISIZE
      inf.end()
    }
    out.toSeq
  }

  /** RFC 1952 header: magic, CM, FLG, MTIME, XFL, OS + optional
    * FEXTRA/FNAME/FCOMMENT/FHCRC fields. Returns the deflate-data offset.
    */
  private def skipGzipHeader(b: Array[Byte], start: Int): Int = {
    require((b(start) & 0xff) == 0x1f && (b(start + 1) & 0xff) == 0x8b,
            s"not a gzip member at offset $start")
    val flg = b(start + 3) & 0xff
    var p = start + 10
    if ((flg & 0x04) != 0) { // FEXTRA
      val xlen = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
      p += 2 + xlen
    }
    if ((flg & 0x08) != 0) { while (b(p) != 0) p += 1; p += 1 } // FNAME
    if ((flg & 0x10) != 0) { while (b(p) != 0) p += 1; p += 1 } // FCOMMENT
    if ((flg & 0x02) != 0) p += 2                               // FHCRC
    p
  }

  /** Decode a whole (possibly multi-member) gzip buffer to one payload
    * (GZIPInputStream concatenates members natively).
    */
  def decodeAll(bytes: Array[Byte]): Array[Byte] =
    readFully(new GZIPInputStream(new ByteArrayInputStream(bytes)))

  private def readFully(in: java.io.InputStream): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](65536)
    var n = in.read(tmp)
    while (n >= 0) {
      buf.write(tmp, 0, n)
      n = in.read(tmp)
    }
    buf.toByteArray
  }

  case class WarcRecord(warcHeaders: Map[String, String],
                        httpStatus: Int,
                        httpHeaders: Map[String, String],
                        payload: Array[Byte])

  /** Parse one WARC record's bytes (already gunzipped). Returns null for
    * non-response records or malformed input (the reference logs and
    * skips, remove_boilerplate.py-adjacent behavior).
    */
  def parseWarcRecord(bytes: Array[Byte]): WarcRecord = {
    val crlf2 = indexOfDoubleNewline(bytes, 0)
    if (crlf2 < 0) return null
    val warcHead = new String(bytes, 0, crlf2, "ISO-8859-1")
    val warcLines = warcHead.split("\r?\n")
    if (warcLines.isEmpty || !warcLines.head.startsWith("WARC/")) return null
    val warcHeaders = headerMap(warcLines.drop(1))
    val bodyStart = skipNewlines(bytes, crlf2)
    if (!warcHeaders.get("WARC-Type").map(_.toLowerCase).contains("response"))
      return WarcRecord(warcHeaders, 0, Map.empty,
        java.util.Arrays.copyOfRange(bytes, bodyStart, bytes.length))
    val httpEnd = indexOfDoubleNewline(bytes, bodyStart)
    if (httpEnd < 0) return null
    val httpHead  = new String(bytes, bodyStart, httpEnd - bodyStart, "ISO-8859-1")
    val httpLines = httpHead.split("\r?\n")
    val status = httpLines.headOption
      .flatMap(l => "HTTP/\\S+\\s+(\\d{3})".r.findFirstMatchIn(l))
      .map(_.group(1).toInt).getOrElse(0)
    val payloadStart = skipNewlines(bytes, httpEnd)
    WarcRecord(warcHeaders, status, headerMap(httpLines.drop(1)),
               java.util.Arrays.copyOfRange(bytes, payloadStart, bytes.length))
  }

  private def headerMap(lines: Array[String]): Map[String, String] =
    lines.iterator.flatMap { l =>
      val i = l.indexOf(':')
      if (i <= 0) None else Some(l.substring(0, i).trim -> l.substring(i + 1).trim)
    }.toMap

  /** Index just past the first blank line (\r\n\r\n or \n\n) from `from`,
    * i.e. the offset OF the blank-line separator; -1 if none.
    */
  private def indexOfDoubleNewline(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length - 1) {
      if (b(i) == '\n' &&
          (b(i + 1) == '\n' || (i + 2 < b.length && b(i + 1) == '\r' && b(i + 2) == '\n')))
        return i
      i += 1
    }
    -1
  }

  private def skipNewlines(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length && (b(i) == '\n' || b(i) == '\r')) i += 1
    i
  }

  // ---- Spark surface ----

  val gzipMemberAtUdf = udf(gzipMemberAt _)
  val decodeAllUdf    = udf((b: Array[Byte]) => decodeAll(b))

  val warcResponseUdf = udf((b: Array[Byte]) => {
    val r = parseWarcRecord(b)
    if (r == null) null
    else {
      val contentType = r.httpHeaders
        .find(_._1.equalsIgnoreCase("Content-Type")).map(_._2).orNull
      (r.warcHeaders.getOrElse("WARC-Target-URI", null),
       r.httpStatus,
       contentType,
       // charset-aware: header charset wins, else strict-UTF-8 probe
       // with lossless Latin-1 fallback (mime.py goes through BS4's
       // charset handling; hard-coded UTF-8 corrupted Latin-1 bodies)
       graft.functions.Mimes.decodeText(r.payload, contentType))
    }
  })

  /** Distributed ranged decode: rows of (file bytes, offset, length) →
    * (url, status, mime, body). Each row is an independent gzip member +
    * WARC parse — embarrassingly parallel, the reference's per-document
    * S3 range request with the network swapped for a bytes column.
    */
  def decodeRanges(df: DataFrame,
                   bytesCol: String = "file_bytes",
                   offsetCol: String = "offset",
                   lengthCol: String = "length"): DataFrame =
    df.withColumn("__rec",
        warcResponseUdf(gzipMemberAtUdf(col(bytesCol), col(offsetCol),
                                        col(lengthCol))))
      .withColumn("url", col("__rec._1"))
      .withColumn("status", col("__rec._2"))
      .withColumn("mime", col("__rec._3"))
      .withColumn("body", col("__rec._4"))
      .drop("__rec")

  /** Multi-stream cluster index reader (S3): binaryFile scan → member
    * decode → one row per index line, with the (file, member, line)
    * provenance the per-file sort (F6) keys on.
    */
  def readClusterGz(spark: SparkSession, path: String): DataFrame = {
    val membersUdf = udf((b: Array[Byte]) =>
      gzipMembers(b).map(m => new String(m, java.nio.charset.StandardCharsets.UTF_8)))
    spark.read.format("binaryFile").load(path)
      .select(col("path").as("file"), membersUdf(col("content")).as("members"))
      .select(col("file"), posexplode(col("members")).as(Seq("member_ord", "member")))
      .select(col("file"), col("member_ord"),
              posexplode(split(col("member"), "\n")).as(Seq("line_ord", "line")))
      .filter(length(trim(col("line"))) > 0)
  }
}
