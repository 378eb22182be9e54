package graft.state

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Partitioned cuckoo-filter state for the live frontier (scheduled /
  * in-flight URL hashes): exact-ish membership with delete support so a
  * URL can be retired and become eligible for recrawl — the operation a
  * bloom filter cannot do. Partitions are growable chains (CuckooChain):
  * capacityPerPartition sizes the first segment only, overflow appends
  * doubled segments — no silent insert failures at any scale. Partition = bits of the url hash, pinned in
  * the serialized form (SURVEY.md §7.4 risk 5: P is part of the state).
  *
  * Role split in the frontier (north rule "bloom/cuckoo URL-seen"):
  * the *url_seen table*'s distributed anti-join is the cross-batch
  * authority (exact, no false drops, no driver-side structure);
  * this cuckoo state deduplicates within the live crawl session and
  * supports retirement, and rides in every snapshot's state dir.
  */
final class UrlSeenState private (val parts: Array[CuckooChain])
    extends Serializable {

  require((parts.length & (parts.length - 1)) == 0,
          "partition count must be a power of two")

  private def partOf(h: Long): Int =
    (CuckooFilter.mix(h) & (parts.length - 1)).toInt

  def insert(h: Long): Boolean = parts(partOf(h)).insert(h)
  def contains(h: Long): Boolean = parts(partOf(h)).contains(h)
  def delete(h: Long): Boolean = parts(partOf(h)).delete(h)
  def size: Long = parts.map(_.size).sum

  /** One blob per partition, deterministic file names. */
  def save(dir: Path): Unit = {
    Files.createDirectories(dir)
    parts.zipWithIndex.foreach { case (p, i) =>
      Files.write(dir.resolve(f"cuckoo-$i%05d.bin"), p.toBytes)
    }
  }
}

object UrlSeenState {

  def create(partitions: Int, capacityPerPartition: Long): UrlSeenState =
    new UrlSeenState(Array.fill(CuckooFilter.nextPow2(partitions))(
      CuckooChain.forCapacity(capacityPerPartition)))

  def load(dir: Path): UrlSeenState = {
    val blobs = Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.startsWith("cuckoo-"))
      .toSeq.sortBy(_.getFileName.toString)
    require(blobs.nonEmpty, s"no cuckoo partitions in $dir")
    new UrlSeenState(blobs.map(p =>
      CuckooChain.fromBytes(Files.readAllBytes(p))).toArray)
  }

  def partitionOf(h: Long, numParts: Int): Int =
    (CuckooFilter.mix(h) & (numParts - 1)).toInt

  private def blobName(i: Int) = f"cuckoo-$i%05d.bin"

  /** Per-partition lineage stats from a distributed state update. */
  case class PartStats(inserted: Long, segments: Int)

  /** Distributed state update: shuffle the new hashes to their state
    * partition, each group loads its previous blob, inserts, writes the
    * next blob — no driver-side collect, one task per partition. Blobs
    * untouched by this batch are carried forward. Returns per-partition
    * inserted counts + segment-chain lengths (lineage metrics; a caller
    * seeing segments > 2 should schedule `compactDistributed`).
    */
  def updateDistributed(spark: org.apache.spark.sql.SparkSession,
                        hashes: org.apache.spark.sql.DataFrame,
                        prevDir: Option[Path], outDir: Path,
                        partitions: Int, capacityPerPartition: Long)
      : Map[Int, PartStats] = {
    import spark.implicits._
    val p = CuckooFilter.nextPow2(partitions)
    Files.createDirectories(outDir)
    val prevStr = prevDir.map(_.toString)
    val outStr  = outDir.toString
    val cap     = capacityPerPartition
    val partUdf = org.apache.spark.sql.functions.udf(
      (h: Long) => partitionOf(h, p))
    val touched = hashes
      .select(partUdf(hashes.col(hashes.columns.head)).as("pid"),
              hashes.col(hashes.columns.head).as("h"))
      .as[(Int, Long)]
      .groupByKey(_._1)
      .mapGroups { (pid, it) =>
        val blob = prevStr.map(d => java.nio.file.Paths.get(d, blobName(pid)))
          .filter(Files.exists(_))
        val filter = blob.map(b => CuckooChain.fromBytes(Files.readAllBytes(b)))
          .getOrElse(CuckooChain.forCapacity(cap))
        var n = 0L
        it.foreach { case (_, h) => if (filter.insert(h)) n += 1 }
        Files.write(java.nio.file.Paths.get(outStr, blobName(pid)),
                    filter.toBytes)
        (pid, n, filter.numSegments)
      }
      .collect().map { case (pid, n, segs) => pid -> PartStats(n, segs) }
      .toMap
    // carry forward untouched partitions
    (0 until p).foreach { pid =>
      val out = outDir.resolve(blobName(pid))
      if (!Files.exists(out)) {
        prevDir.map(_.resolve(blobName(pid))).filter(Files.exists(_)) match {
          case Some(prev) => Files.copy(prev, out)
          case None => Files.write(out,
            CuckooChain.forCapacity(cap).toBytes)
        }
      }
    }
    touched
  }

  /** Segment-chain compaction at snapshot commit: rebuild each partition's
    * chain as ONE right-sized filter from the authoritative seen-hash set
    * (the url_seen table — the cuckoo state is a derived accelerator, so
    * the table is the source of truth to rebuild from). Bounds the
    * false-positive rate, which otherwise grows linearly with segment
    * count. One task per partition, blob overwritten in place in the
    * still-uncommitted snapshot state dir. Keys are sorted before insert
    * so the rebuilt blob is byte-deterministic for a given seen set.
    * Returns per-partition rebuilt segment counts (1 except at
    * pathological load).
    */
  def compactDistributed(spark: org.apache.spark.sql.SparkSession,
                         allHashes: org.apache.spark.sql.DataFrame,
                         outDir: Path,
                         partitions: Int, capacityPerPartition: Long)
      : Map[Int, Int] = {
    import spark.implicits._
    val p = CuckooFilter.nextPow2(partitions)
    val outStr = outDir.toString
    val cap    = capacityPerPartition
    val partUdf = org.apache.spark.sql.functions.udf(
      (h: Long) => partitionOf(h, p))
    allHashes
      .select(partUdf(allHashes.col(allHashes.columns.head)).as("pid"),
              allHashes.col(allHashes.columns.head).as("h"))
      // Dedup before rebuild: a caller unioning overlapping snapshot sets
      // would otherwise insert duplicate fingerprints — count drift plus
      // phantom membership after one delete. Cheap relative to the rebuild
      // (same shuffle keys, partial agg upstream).
      .distinct()
      .as[(Int, Long)]
      .groupByKey(_._1)
      .mapGroups { (pid, it) =>
        val b = Array.newBuilder[Long]
        it.foreach(kv => b += kv._2)
        val keys = b.result()
        java.util.Arrays.sort(keys)
        val chain = CuckooChain.forCapacity(math.max(cap, keys.length))
        keys.foreach(chain.insert)
        Files.write(java.nio.file.Paths.get(outStr, blobName(pid)),
                    chain.toBytes)
        (pid, chain.numSegments)
      }
      .collect().toMap
  }
}
