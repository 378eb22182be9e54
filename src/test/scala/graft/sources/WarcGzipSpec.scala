package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.GZIPOutputStream

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** S3 multi-stream gzip decode + S2 ranged member decode + S4 WARC record
  * parse (cc_corpus/index.py:250–268, download.py:23–104).
  */
class WarcGzipSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def gz(payload: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new GZIPOutputStream(bos)
    out.write(payload); out.close()
    bos.toByteArray
  }

  private def warcResponse(url: String, mime: String, body: String): Array[Byte] =
    (s"WARC/1.0\r\n" +
      s"WARC-Type: response\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      s"Content-Length: 0\r\n" +
      "\r\n" +
      "HTTP/1.1 200 OK\r\n" +
      s"Content-Type: $mime\r\n" +
      "\r\n" +
      body).getBytes("UTF-8")

  test("gzip members: split concatenated members exactly") {
    val parts = Seq("alpha\nbeta\n", "gamma\n", "delta epsilon\n")
    val buf = parts.map(p => gz(p.getBytes("UTF-8")))
      .reduce(_ ++ _)
    val members = WarcGzip.gzipMembers(buf)
    assert(members.map(new String(_, "UTF-8")) == parts)
    // decodeAll concatenates all members
    assert(new String(WarcGzip.decodeAll(buf), "UTF-8") == parts.mkString)
  }

  test("gzip ranged member decode (offset/length as in cluster.idx)") {
    val m1 = gz("first cluster".getBytes("UTF-8"))
    val m2 = gz("second cluster".getBytes("UTF-8"))
    val buf = m1 ++ m2
    assert(new String(WarcGzip.gzipMemberAt(buf, 0, m1.length), "UTF-8")
      == "first cluster")
    assert(new String(WarcGzip.gzipMemberAt(buf, m1.length, m2.length), "UTF-8")
      == "second cluster")
  }

  test("WARC response record parse: url, status, mime, payload") {
    val rec = WarcGzip.parseWarcRecord(
      warcResponse("https://x.example.com/a", "text/html", "<html>hi</html>"))
    assert(rec.warcHeaders("WARC-Target-URI") == "https://x.example.com/a")
    assert(rec.httpStatus == 200)
    assert(rec.httpHeaders("Content-Type") == "text/html")
    assert(new String(rec.payload, "UTF-8") == "<html>hi</html>")
    assert(WarcGzip.parseWarcRecord("garbage".getBytes) == null)
  }

  test("distributed ranged decode: (bytes, offset, length) -> url/status/mime/body") {
    import spark.implicits._
    val m1 = gz(warcResponse("https://a.example.com/", "text/html", "<p>a</p>"))
    val m2 = gz(warcResponse("https://b.example.com/", "text/plain", "plain b"))
    val file = m1 ++ m2
    val df = Seq(
      (file, 0L, m1.length.toLong),
      (file, m1.length.toLong, m2.length.toLong)
    ).toDF("file_bytes", "offset", "length")
    val got = WarcGzip.decodeRanges(df)
      .select("url", "status", "mime", "body")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
                           r.getString(3))).toSet
    assert(got == Set(
      ("https://a.example.com/", 200, "text/html", "<p>a</p>"),
      ("https://b.example.com/", 200, "text/plain", "plain b")))
  }

  test("cluster index reader: binaryFile -> member/line provenance") {
    val dir = java.nio.file.Files.createTempDirectory("cidx")
    val buf = gz("l1\nl2\n".getBytes) ++ gz("l3\n".getBytes)
    java.nio.file.Files.write(dir.resolve("cluster.idx.gz"), buf)
    val rows = WarcGzip.readClusterGz(spark, dir.toString)
      .select("member_ord", "line_ord", "line")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    assert(rows == Set((0, 0, "l1"), (0, 1, "l2"), (1, 0, "l3")))
  }

  test("writer round-trips through the reader, field for field") {
    val payload = "hello <b>warc</b> world \u00e9".getBytes("UTF-8")
    val rec = WarcGzip.buildWarcResponse(
      "https://ex.com/a?q=1", 1700000123L, payload, 200, "text/html")
    val parsed = WarcGzip.parseWarcRecord(WarcGzip.decodeAll(rec))
    assert(parsed != null)
    assert(parsed.warcHeaders("WARC-Target-URI") == "https://ex.com/a?q=1")
    assert(parsed.warcHeaders("WARC-Date") == "2023-11-14T22:15:23Z")
    assert(parsed.httpStatus == 200)
    assert(parsed.httpHeaders("Content-Length") == payload.length.toString)
    assert(java.util.Arrays.equals(parsed.payload, payload))
    // payload digest is honest sha-1 of the payload bytes
    val d = java.security.MessageDigest.getInstance("SHA-1")
      .digest(payload).map("%02x".format(_)).mkString
    assert(parsed.warcHeaders("WARC-Payload-Digest") == s"sha1:$d")
  }

  test("writer output is deterministic and member-concatenable") {
    val a = WarcGzip.buildWarcResponse("https://a/1", 1L, Array[Byte](1, 2))
    val b = WarcGzip.buildWarcResponse("https://a/1", 1L, Array[Byte](1, 2))
    assert(java.util.Arrays.equals(a, b)) // reproducible shards
    val c = WarcGzip.buildWarcResponse("https://a/2", 2L, Array[Byte](3))
    // a shard = concatenated members; the member walk splits it back
    val members = WarcGzip.gzipMembers(a ++ c)
    assert(members.size == 2)
    assert(WarcGzip.parseWarcRecord(members(0))
      .warcHeaders("WARC-Target-URI") == "https://a/1")
    assert(WarcGzip.parseWarcRecord(members(1))
      .warcHeaders("WARC-Target-URI") == "https://a/2")
    // and ranged access works at (offset, length) of the second member
    assert(WarcGzip.parseWarcRecord(
      WarcGzip.gzipMemberAt(a ++ c, a.length.toLong, c.length.toLong))
      .httpStatus == 200)
  }

  test("indexShards: contiguous offsets; every record re-reads at its range") {
    val s = graft.TestSpark.spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val recs = (0 until 12).map { i =>
      (i % 3L, i.toLong, s"https://h$i.ex.com/p",
       WarcGzip.buildWarcResponse(s"https://h$i.ex.com/p", 100L + i,
         s"payload-$i".getBytes("US-ASCII")))
    }.toDF("shard", "ord", "url", "rec")
    val idx = WarcGzip.indexShards(recs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("offset"), r.getAs[Long]("length"))).toMap
    // per shard: offsets are the prefix sums of lengths in ord order
    (0L until 3L).foreach { sh =>
      val ords = (0 until 12).map(_.toLong).filter(_ % 3 == sh).sorted
      var expect = 0L
      ords.foreach { o =>
        val (off, len) = idx((sh, o))
        assert(off == expect, s"shard $sh ord $o")
        expect += len
      }
    }
    // ranged re-read through the production reader at every index row
    val bytes = WarcGzip.shardBytes(recs).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    idx.foreach { case ((sh, o), (off, len)) =>
      val rec = WarcGzip.parseWarcRecord(
        WarcGzip.gzipMemberAt(bytes(sh), off, len))
      assert(rec.warcHeaders("WARC-Target-URI") == s"https://h$o.ex.com/p")
      assert(new String(rec.payload, "US-ASCII") == s"payload-$o")
    }
  }
}
