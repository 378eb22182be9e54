package graft.ref

import graft.functions.{Mimes, Urls}
import graft.model.RawIndexLine

import scala.collection.mutable

/** Single-threaded reference interpreter: a faithful Scala transcription
  * of the Python *semantics* (not code) of the index filter + URL dedup +
  * crawl-order chain (scripts/filter_index.py, deduplicate_index_urls.py,
  * download_pages.py:145–153). Used only as the test oracle — parity
  * specs require the distributed Spark operators to produce row-identical
  * results (SURVEY.md §5).
  */
object RefInterpreter {

  /** Fields as the reference carries them between stages: all strings
    * (post-http_filter 7-tuple: domain prepended).
    */
  case class Fields(domain: String, url: String, warc: String,
                    offset: String, length: String, status: String,
                    mime: String)

  case class Kept(fields: Fields, file: String, fileOrd: Int, lineOrd: Long)

  // -- minimal flat string-string JSON parser (fixture lines only) --
  private val PairRe = """"([^"\\]*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r

  def parseJson(s: String): Map[String, String] =
    PairRe.findAllMatchIn(s).map { m =>
      val v = m.group(2)
        .replace("\\\"", "\"").replace("\\\\", "\\")
      m.group(1) -> v
    }.toMap

  /** read_fields: json payload after the 2nd space; defaults status=0,
    * mime=unknown/unknown.
    */
  def readFields(line: String): Option[(String, String, String, String, String, String)] = {
    val json = line.split(" ", 3).last
    val m    = parseJson(json)
    for (url <- m.get("url"); warc <- m.get("filename");
         off <- m.get("offset"); len <- m.get("length"))
      yield (url, warc, off, len,
             m.getOrElse("status", "0"), m.getOrElse("mime", "unknown/unknown"))
  }

  private val RobotsRe = "/robots\\.txt".r.unanchored

  /** filter_index.py filter_file: read_fields → basic → mime → http →
    * bad_index → stable sort by (domain, url). Returns per-file sorted
    * entries keyed by (file, fileOrd) with post-sort line order.
    */
  def filterIndex(lines: Seq[RawIndexLine],
                  allowedMimes: Set[String] = Mimes.DefaultAllowed,
                  badIndexPatterns: Seq[String] = Seq.empty): Seq[Kept] = {
    val badRe = if (badIndexPatterns.isEmpty) None
    else Some(("^(?:" + badIndexPatterns.mkString(")|(?:") + ")$").r)

    lines.groupBy(l => (l.file, l.file_ord)).toSeq.sortBy(_._1._2).flatMap {
      case ((file, fileOrd), fileLines) =>
        val passed = fileLines.sortBy(_.line_ord).iterator
          .flatMap(l => readFields(l.line))
          // basic_filter
          .filter { case (url, _, _, _, status, _) =>
            RobotsRe.findFirstIn(url).isEmpty && status.trim.toInt == 200 }
          // mime_filter
          .flatMap { case (url, warc, off, len, status, mime) =>
            Option(Mimes.normalize(mime))
              .filter(allowedMimes.contains)
              .map(m => (url, warc, off, len, status, m)) }
          // http_filter
          .map { case (url, warc, off, len, status, mime) =>
            Fields(Urls.stripWww(Urls.host(url)), url, warc, off, len,
                   status, mime) }
          // bad_index_filter
          .filter { f =>
            val joined = Seq(f.domain, f.url, f.warc, f.offset, f.length,
                             f.status, f.mime).mkString(" ")
            badRe.forall(_.findFirstMatchIn(joined).isEmpty) }
          .toVector
        // stable per-file sort by (domain, url)
        passed.sortBy(f => (f.domain, f.url)).zipWithIndex.map {
          case (f, i) => Kept(f, file, fileOrd, (i + 1).toLong)
        }
    }
  }

  case class Record(warc: String, offset: Long, length: Long, index: String)

  /** uniq_record: strictly-greater replaces; ties keep incumbent. */
  private def uniq(url: String, rec: Record,
                   uniqs: mutable.LinkedHashMap[String, Record],
                   keep: String): Unit =
    uniqs.get(url) match {
      case Some(other) =>
        val reject =
          if (keep == "latest") rec.warc <= other.warc
          else rec.length <= other.length
        if (!reject) uniqs.update(url, rec)
      case None => uniqs.update(url, rec)
    }

  /** deduplicate_index_urls two-phase collection: per-file dict then
    * global merge, files in file_ord order.
    */
  def collectWinners(filtered: Seq[Kept], keep: String = "biggest",
                     skipUrls: Set[String] = Set.empty): mutable.LinkedHashMap[String, Record] = {
    val global = mutable.LinkedHashMap.empty[String, Record]
    filtered.groupBy(k => (k.file, k.fileOrd)).toSeq.sortBy(_._1._2)
      .foreach { case ((file, _), ks) =>
        val inFile = mutable.LinkedHashMap.empty[String, Record]
        ks.sortBy(_.lineOrd).foreach { k =>
          if (!skipUrls.contains(k.fields.url)) {
            uniq(k.fields.url,
                 Record(k.fields.warc, k.fields.offset.toLong,
                        k.fields.length.toLong, file),
                 inFile, keep)
          }
        }
        inFile.foreach { case (url, rec) => uniq(url, rec, global, keep) }
      }
    global
  }

  /** Pass 2 (filter_file): keep lines whose (warc, offset, length) equal
    * the winner (index ignored — pass-2 records carry none).
    */
  def keepWinners(filtered: Seq[Kept],
                  winners: collection.Map[String, Record]): Seq[Kept] =
    filtered.filter { k =>
      winners.get(k.fields.url).exists(w =>
        w.warc == k.fields.warc && w.offset == k.fields.offset.toLong &&
          w.length == k.fields.length.toLong)
    }

  /** O3 crawl order: sort by (warc, offset numeric) with the determinized
    * total tie-break (url, file_ord, line_ord) — same as the Spark side.
    */
  def crawlOrder(kept: Seq[Kept]): Seq[Kept] =
    kept.sortBy(k => (k.fields.warc, k.fields.offset.toLong, k.fields.url,
                      k.fileOrd, k.lineOrd))
}
