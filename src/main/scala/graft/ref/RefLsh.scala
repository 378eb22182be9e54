package graft.ref

import graft.functions.MinHashF

import scala.collection.mutable

/** Single-threaded reference replay of the datasketch-based LSH dedup
  * loops (scripts/lsh.py deduplicate_self :96–135 / deduplicate_other
  * :160–223), using our minhash family. Test oracle only.
  */
object RefLsh {

  case class MhDoc(docId: String, ord: Long, bands: Array[Long])

  def minhash(docId: String, ord: Long, text: String, b: Int): MhDoc =
    MhDoc(docId, ord, MinHashF.bandHashes(MinHashF.signature(text), b))

  /** First-wins self-dedup: returns kept ords in processing order. */
  def selfDedup(docs: Seq[MhDoc]): Seq[MhDoc] = {
    val insertedIds   = mutable.HashSet.empty[String]
    val insertedBands = mutable.HashSet.empty[(Int, Long)]
    val out           = mutable.ArrayBuffer.empty[MhDoc]
    docs.sortBy(_.ord).foreach { d =>
      if (!insertedIds.contains(d.docId)) {
        val hit = d.bands.iterator.zipWithIndex
          .exists { case (h, i) => insertedBands.contains((i, h)) }
        if (!hit) {
          insertedIds += d.docId
          d.bands.iterator.zipWithIndex.foreach { case (h, i) =>
            insertedBands += ((i, h))
          }
          out += d
        }
      }
    }
    out.toSeq
  }

  /** Query-only cross-dedup: keep docs with no band collision vs seen. */
  def crossDedup(docs: Seq[MhDoc], seen: Seq[MhDoc]): Seq[MhDoc] = {
    val seenBands = mutable.HashSet.empty[(Int, Long)]
    seen.foreach(_.bands.iterator.zipWithIndex.foreach { case (h, i) =>
      seenBands += ((i, h))
    })
    docs.filterNot(_.bands.iterator.zipWithIndex.exists { case (h, i) =>
      seenBands.contains((i, h))
    })
  }
}
