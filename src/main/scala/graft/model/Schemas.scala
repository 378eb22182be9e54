package graft.model

/** Core data model of the crawl engine (SURVEY.md §1). Explicit case
  * classes / StructTypes everywhere — the reference's schemas are
  * positional text-line conventions; ours are declared.
  */

/** One span of an interleaved text+media document (BASELINE.json
  * `input_hint`). A text paragraph (reference Document.paragraphs,
  * cc_corpus/corpus.py:26–41) is `kind='p'`; media is `kind='media'`
  * with a `media_ref` into the warc store. `offset` is the 0-based
  * sequence position — the "order" of the span-sequence invariant.
  */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** Interleaved document row (the input_hint table). */
case class Doc(doc_id: String, spans: Seq[Span])

/** A raw CC index line: `SURT timestamp {json}` (cc_corpus/index.py:271–276).
  * `file` + `line_ord` thread the reference's processing order (sorted file
  * list, then line order) through every downstream operator, making
  * first/last-wins semantics explicit and partitioning-invariant
  * (SURVEY.md §7.4 risk 1).
  */
case class RawIndexLine(file: String, file_ord: Int, line_ord: Long,
                        line: String)

/** Post-filter index entry (filter_index.py:113–117: domain prepended). */
case class IndexEntry(domain: String, url: String, warc: String,
                      offset: Long, length: Long, status: Int, mime: String,
                      file_ord: Int, line_ord: Long)

/** URL-seen record — the winner per URL (deduplicate_index_urls.py:85–122).
  * `index` (source index file) participates in equality only when non-null.
  */
case class UrlSeenRecord(url: String, warc: String, offset: Long,
                         length: Long, index: String)

/** Robots rule row (new surface per north rule; reference only drops
  * literal /robots.txt entries, filter_index.py:37,87).
  */
case class RobotsRule(host_key: String, path_prefix: String, allow: Boolean)

/** Synthetic WARC-store row: replaces the S3 ranged fetch
  * (cc_corpus/download.py:23–104) with a deterministic lookup.
  */
case class WarcRecord(warc: String, offset: Long, length: Long,
                      status: Int, mime: String, body: String)

/** A cluster row of the CC index-of-index (cc_corpus/index.py:39–59). */
case class Cluster(surt: String, file_name: String, offset: Long,
                   length: Long)

/** Frequent-paragraph candidate state (cc_corpus/frequent.py:19–77). */
case class PData(minhash: Array[Long], score: Double, count: Long)
