package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Charset sniffing + transcoding for fetched payloads — the step
  * between raw WARC bytes and every text operator in this engine (all
  * of which assume UTF-8 strings). Detection follows the WHATWG
  * priority order a browser applies: BOM, then an in-document
  * `charset=` / XML `encoding=` declaration in the first `sniffLimit`
  * bytes, then strict UTF-8 validity, then the windows-1252 legacy
  * default. Decoding itself is java.nio.charset with REPLACE (a broken
  * byte can never fail a task).
  *
  * Scale shape: embarrassingly parallel per row (one UDF call, no
  * state, no shuffle) — identical batching contract to the multimodal
  * decode paths.
  */
object Charsets {

  // Declarations are only honored INSIDE an actual <meta …> tag or the
  // XML prolog (the WHATWG prescan contract) — a bare `encoding=` in
  // body content (e.g. a link's query string) must NOT hijack the
  // detected charset.
  private val DeclRe =
    ("(?is)(?:<meta\\s[^>]*?charset\\s*=\\s*[\"']?" +
      "|<\\?xml\\s[^>]*?encoding\\s*=\\s*[\"']?)" +
      "([A-Za-z0-9_][A-Za-z0-9._\\-]*)").r

  /** Detected charset name (canonical JVM name, lowercase) and BOM
    * length. Unknown/unsupported declared names fall through to the
    * UTF-8-validity/1252 steps, like a browser ignoring a bogus meta.
    */
  def sniff(bytes: Array[Byte], sniffLimit: Int = 1024): (String, Int) = {
    if (bytes == null) return ("windows-1252", 0)
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef &&
        (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf)
      return ("utf-8", 3)
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe &&
        (bytes(1) & 0xff) == 0xff) return ("utf-16be", 2)
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xfe) return ("utf-16le", 2)
    // declaration scan over an ASCII-superset view of the prefix
    val head = new String(bytes, 0, math.min(sniffLimit, bytes.length),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    DeclRe.findFirstMatchIn(head).foreach { m =>
      val name = m.group(1)
      try {
        val cs = java.nio.charset.Charset.forName(name)
        return (cs.name().toLowerCase(java.util.Locale.ROOT), 0)
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    if (isValidUtf8(bytes)) ("utf-8", 0) else ("windows-1252", 0)
  }

  def isValidUtf8(bytes: Array[Byte]): Boolean =
    try {
      java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        .decode(java.nio.ByteBuffer.wrap(bytes))
      true
    } catch { case _: java.nio.charset.CharacterCodingException => false }

  /** Sniff + decode to UTF-8 text (malformed input replaced, never
    * thrown). Returns (charset, text).
    */
  def decode(bytes: Array[Byte], sniffLimit: Int = 1024): (String, String) = {
    if (bytes == null) return ("windows-1252", "")
    val (name, bom) = sniff(bytes, sniffLimit)
    val cs = java.nio.charset.Charset.forName(name)
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    val text = dec.decode(java.nio.ByteBuffer.wrap(
      bytes, bom, bytes.length - bom)).toString
    (name, text)
  }

  val decodeUdf = udf((b: Array[Byte], limit: Int) => decode(b, limit))

  /** Column form over a payload table: adds (charset, text) from
    * `bytesCol`.
    */
  def transcode(payloads: DataFrame, bytesCol: String = "bytes",
                sniffLimit: Int = 1024): DataFrame =
    payloads
      .withColumn("__d", decodeUdf(col(bytesCol), lit(sniffLimit)))
      .withColumn("charset", col("__d._1"))
      .withColumn("text", col("__d._2"))
      .drop("__d")
}
