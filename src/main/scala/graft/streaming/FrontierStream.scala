package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the URL-seen winner state (SURVEY.md §2.7): the
  * batch pipeline's A0 argmax as `flatMapGroupsWithState` keyed by URL.
  * Each incoming index entry challenges the stored winner with the same
  * strict-greater priority as the batch operator — (length, -file_ord,
  * -line_ord) for keep=biggest — so the converged state is identical to
  * the batch winners regardless of arrival order, and every emitted row
  * is a winner *change* (the incremental frontier update stream).
  *
  * The reference's closest analogue is the cumulative cross-dedup chain
  * (lsh.py:138–157 DONE-file batches): each micro-batch here is one
  * incremental dump, `Trigger.AvailableNow` reproduces the batch chain.
  */
object FrontierStream {

  case class Entry(url: String, warc: String, offset: Long, length: Long,
                   file_ord: Int, line_ord: Long)

  case class Winner(url: String, warc: String, offset: Long, length: Long,
                    file_ord: Int, line_ord: Long)

  private def earlier(aF: Int, aL: Long, bF: Int, bL: Long): Boolean =
    aF < bF || (aF == bF && aL < bL)

  private def beats(a: Entry, w: Winner, keep: String): Boolean =
    if (keep == "latest") {
      val c = a.warc.compareTo(w.warc)
      c > 0 || (c == 0 && earlier(a.file_ord, a.line_ord, w.file_ord, w.line_ord))
    } else {
      a.length > w.length ||
        (a.length == w.length &&
          earlier(a.file_ord, a.line_ord, w.file_ord, w.line_ord))
    }

  /** Streaming winner updates: emits a row whenever a URL's winner
    * changes (first sight included). Use with OutputMode.Update.
    */
  def winnerUpdates(entries: Dataset[Entry],
                    keep: String = "biggest"): Dataset[Winner] = {
    import entries.sparkSession.implicits._
    entries
      .groupByKey(_.url)
      .flatMapGroupsWithState[Winner, Winner](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (url: String, it: Iterator[Entry], state: GroupState[Winner]) =>
          var cur = state.getOption.orNull
          var changed = false
          it.foreach { e =>
            if (cur == null || beats(e, cur, keep)) {
              cur = Winner(e.url, e.warc, e.offset, e.length, e.file_ord,
                           e.line_ord)
              changed = true
            }
          }
          if (changed) { state.update(cur); Iterator.single(cur) }
          else Iterator.empty
      }
  }

  case class BandRow(doc_id: String, band: Int, bhash: Long)
  case class DedupVerdict(doc_id: String, dup: Boolean)

  /** Streaming LSH cross-dedup — the cumulative dedup chain
    * (lsh.py:138–157) as a stream. Band rows arrive keyed by
    * (band, bhash); state per bucket is the first doc_id that claimed it.
    * A doc is a duplicate iff ANY of its buckets is owned by another doc
    * (downstream: doc survives iff max(dup) over its verdicts is false).
    *
    * Semantics: ACROSS micro-batches this equals the batch A2 query-only
    * dedup (any collision with an earlier batch drops the doc). WITHIN a
    * micro-batch it is bucket-claim first-wins by doc_id — slightly
    * stricter than A1's sequential replay, where a doc dropped earlier
    * never suppresses later docs; run per-batch A1 first (LshDedup
    * .selfDedup) when that distinction matters, exactly like the
    * reference runs self-dedup before the cross-dedup chain.
    */
  def crossDedupUpdates(bands: Dataset[BandRow]): Dataset[DedupVerdict] = {
    import bands.sparkSession.implicits._
    bands
      .groupByKey(b => (b.band, b.bhash))
      .flatMapGroupsWithState[String, DedupVerdict](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), it: Iterator[BandRow], state: GroupState[String]) =>
          val docs = it.map(_.doc_id).toArray.sorted.distinct
          val owner0 = state.getOption.orNull
          val owner  = if (owner0 != null) owner0 else docs.head
          if (owner0 == null) state.update(owner)
          docs.iterator.map(d => DedupVerdict(d, d != owner))
      }
  }

  /** Windowed crawl statistics over a fetch-event stream (per-host
    * throughput with watermarked tumbling windows) — the streaming
    * counterpart of A6 index statistics.
    */
  def hostWindowStats(events: DataFrame,
                      window_ : String = "1 hour",
                      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("host_key"))
      .agg(count(lit(1)).as("n_fetched"),
           sum(col("length")).as("bytes"))
}
