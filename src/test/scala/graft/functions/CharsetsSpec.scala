package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class CharsetsSpec extends AnyFunSuite {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("sniff priority: BOM > declaration > UTF-8 validity > 1252") {
    // BOM wins even over a contradicting declaration
    val bommed = b(0xef, 0xbb, 0xbf) ++
      "<meta charset=iso-8859-1>x".getBytes("US-ASCII")
    assert(Charsets.sniff(bommed) == (("utf-8", 3)))
    assert(Charsets.sniff(b(0xfe, 0xff, 0, 65)) == (("utf-16be", 2)))
    assert(Charsets.sniff(b(0xff, 0xfe, 65, 0)) == (("utf-16le", 2)))
    // declaration (xml form too)
    assert(Charsets.sniff(
      "<?xml encoding='ISO-8859-1'?>".getBytes("US-ASCII"))._1
      == "iso-8859-1")
    // bogus declared name falls through to validity
    assert(Charsets.sniff(
      "<meta charset=not-a-charset>plain".getBytes("US-ASCII"))._1
      == "utf-8")
    // valid multi-byte UTF-8, no declaration
    assert(Charsets.sniff("café".getBytes("UTF-8"))._1 == "utf-8")
    // lone continuation byte: not UTF-8 -> legacy default
    assert(Charsets.sniff(b('i', 't', 0x92, 's'))._1 == "windows-1252")
    // a bare charset=/encoding= OUTSIDE a meta/xml declaration (e.g. a
    // link's query string) must NOT hijack detection
    assert(Charsets.sniff(
      "<a href=\"/convert?encoding=utf-16le\">x</a>"
        .getBytes("US-ASCII"))._1 == "utf-8")
    assert(Charsets.sniff(
      "body text charset=utf-16be more".getBytes("US-ASCII"))._1
      == "utf-8")
  }

  test("decode: transcodes per sniffed charset, strips BOM, no throw") {
    assert(Charsets.decode("plain".getBytes("UTF-8"))
      == (("utf-8", "plain")))
    assert(Charsets.decode(b(0xef, 0xbb, 0xbf) ++ "x".getBytes("UTF-8"))
      == (("utf-8", "x")))
    assert(Charsets.decode(b(0xff, 0xfe) ++ "ab".getBytes("UTF-16LE"))
      == (("utf-16le", "ab")))
    // windows-1252 smart quote
    assert(Charsets.decode(b('i', 't', 0x92, 's'))
      == (("windows-1252", "it’s")))
    // declared latin-1 with a true high byte
    val latin = "<meta charset=iso-8859-1>caf".getBytes("US-ASCII") ++
      b(0xe9)
    assert(Charsets.decode(latin)
      == (("iso-8859-1", "<meta charset=iso-8859-1>café")))
    // truncated UTF-16 payload decodes with replacement, never throws
    val broken = b(0xff, 0xfe, 65)
    assert(Charsets.decode(broken)._1 == "utf-16le")
    // null payload
    assert(Charsets.decode(null) == (("windows-1252", "")))
  }

  test("sniffLimit bounds the declaration scan") {
    val late = (" " * 2000 + "<meta charset=iso-8859-1>")
      .getBytes("US-ASCII") ++ b(0xe9)
    // declaration beyond the window is not seen; 0xe9 kills UTF-8
    assert(Charsets.sniff(late)._1 == "windows-1252")
    assert(Charsets.sniff(late, sniffLimit = 4096)._1 == "iso-8859-1")
  }
}
