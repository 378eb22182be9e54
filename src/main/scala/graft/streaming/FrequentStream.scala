package graft.streaming

import graft.operators.FrequentParagraphs
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of A3 (decayed frequent-paragraph collection): the
  * SAME Collector state machine the batch operator and the sequential
  * reference oracle run (FrequentParagraphs.Collector — semantics from
  * frequent_paragraphs.py / frequent.py:41–50), lifted into
  * `flatMapGroupsWithState` keyed by domain. Per trigger: restore the
  * domain's state under its ORIGINAL keys (insertion order preserved —
  * exact continuation, not a bootstrap epoch), replay the micro-batch's
  * docs in `ord` order, persist the snapshot, emit the current
  * frequents (count >= minFreq) as Update-mode rows.
  *
  * Feeding micro-batches in ord order (each trigger = one incremental
  * dump, `Trigger.AvailableNow` replays a backlog) converges to exactly
  * the batch `FrequentParagraphs.collect` output — spec'd in
  * FrequentStreamSpec.
  */
object FrequentStream {

  case class PDocRow(domain: String, ord: Long, doc_id: String,
                     pbands: Seq[Seq[Long]])
  case class PEntry(key: String, bands: Seq[Long], score: Double, count: Long)
  case class PState(entries: Seq[PEntry])
  case class FrequentUpdate(domain: String, pdata_id: Int, bands: Seq[Long],
                            score: Double, count: Long)

  def frequentUpdates(docs: Dataset[PDocRow],
                      decay: Double = 0.99,
                      minFreq: Long = 2,
                      decayThreshold: Double = 0.5): Dataset[FrequentUpdate] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.domain)
      .flatMapGroupsWithState[PState, FrequentUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (domain: String, it: Iterator[PDocRow], state: GroupState[PState]) =>
          val c = new FrequentParagraphs.Collector(decay, decayThreshold)
          state.getOption.foreach(s => c.restore(
            s.entries.map(e => (e.key, e.bands.toArray, e.score, e.count))))
          // within-trigger replay order is the domain's ord order; the
          // group fits one trigger's slice of one domain
          it.toArray.sortBy(_.ord).foreach(d =>
            c.addDoc(d.doc_id, d.pbands.map(_.toArray)))
          state.update(PState(c.snapshot.map(e =>
            PEntry(e._1, e._2, e._3, e._4))))
          c.wrapUp(minFreq).iterator.map { case (id, pd) =>
            FrequentUpdate(domain, id, pd.bands.toSeq, pd.score, pd.count)
          }
      }
  }
}
