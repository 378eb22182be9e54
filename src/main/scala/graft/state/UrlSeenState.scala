package graft.state

import java.nio.file.Path

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

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
  *
  * All blob IO goes through the Hadoop FileSystem API resolved from the
  * directory URI, so state dirs work identically on `file:`, `hdfs:` and
  * `s3a:`. This is what makes the "one task per partition, no driver
  * collect" design hold on a real cluster: executors write the SHARED
  * filesystem the driver commits, not node-local disks (which a plain
  * java.nio path would silently hit).
  */
final class UrlSeenState private[state] (val parts: Array[CuckooChain])
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
  def save(dir: String, conf: Configuration = new Configuration()): Unit = {
    val d = new HPath(dir)
    val fs = d.getFileSystem(conf)
    fs.mkdirs(d)
    parts.zipWithIndex.foreach { case (p, i) =>
      UrlSeenState.writeBlob(fs, new HPath(d, UrlSeenState.blobName(i)), p.toBytes)
    }
  }
  def save(dir: Path): Unit = save(dir.toString)
}

object UrlSeenState {

  def create(partitions: Int, capacityPerPartition: Long): UrlSeenState =
    new UrlSeenState(Array.fill(CuckooFilter.nextPow2(partitions))(
      CuckooChain.forCapacity(capacityPerPartition)))

  def load(dir: String, conf: Configuration): UrlSeenState = {
    val d = new HPath(dir)
    val fs = d.getFileSystem(conf)
    val blobs = fs.listStatus(d).map(_.getPath)
      .filter(_.getName.startsWith("cuckoo-"))
      .sortBy(_.getName)
    require(blobs.nonEmpty, s"no cuckoo partitions in $dir")
    new UrlSeenState(blobs.map(p =>
      CuckooChain.fromBytes(readBlob(fs, p))).toArray)
  }
  def load(dir: String): UrlSeenState = load(dir, new Configuration())
  def load(dir: Path): UrlSeenState = load(dir.toString)

  def partitionOf(h: Long, numParts: Int): Int =
    (CuckooFilter.mix(h) & (numParts - 1)).toInt

  private def blobName(i: Int) = f"cuckoo-$i%05d.bin"

  private def readBlob(fs: FileSystem, p: HPath): Array[Byte] = {
    val len = fs.getFileStatus(p).getLen
    require(len <= Int.MaxValue, s"cuckoo blob too large: $p ($len bytes)")
    val buf = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0L, buf) finally in.close()
    buf
  }

  private def writeBlob(fs: FileSystem, p: HPath, bytes: Array[Byte]): Unit = {
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  /** Hadoop Configuration is not java-serializable; ship it to tasks via
    * its own writable form (same trick as Spark's internal
    * SerializableConfiguration, which is not public API).
    */
  private final class SerConf(@transient var value: Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false)
      value.readFields(in)
    }
  }

  /** Per-partition lineage stats from a distributed state update. */
  case class PartStats(inserted: Long, segments: Int)

  /** Distributed state update: shuffle the new hashes to their state
    * partition, each group loads its previous blob, inserts, writes the
    * next blob — no driver-side collect, one task per partition. Blobs
    * untouched by this batch are carried forward. Returns per-partition
    * inserted counts + segment-chain lengths (lineage metrics; a caller
    * seeing segments > 2 should schedule `compactDistributed`).
    *
    * Dirs are Hadoop-FS URIs (plain paths resolve as `file:`); executors
    * and driver must see the same filesystem (`hdfs:`/`s3a:` on a
    * cluster, any path on a single box).
    */
  def updateDistributed(spark: org.apache.spark.sql.SparkSession,
                        hashes: org.apache.spark.sql.DataFrame,
                        prevDir: Option[String], outDir: String,
                        partitions: Int, capacityPerPartition: Long)
      : Map[Int, PartStats] = {
    import spark.implicits._
    val p = CuckooFilter.nextPow2(partitions)
    val conf = spark.sessionState.newHadoopConf()
    val outPath = new HPath(outDir)
    outPath.getFileSystem(conf).mkdirs(outPath)
    val bConf   = spark.sparkContext.broadcast(new SerConf(conf))
    val prevStr = prevDir
    val outStr  = outDir
    val cap     = capacityPerPartition
    val partUdf = org.apache.spark.sql.functions.udf(
      (h: Long) => partitionOf(h, p))
    val touched = hashes
      .select(partUdf(hashes.col(hashes.columns.head)).as("pid"),
              hashes.col(hashes.columns.head).as("h"))
      .as[(Int, Long)]
      .groupByKey(_._1)
      .mapGroups { (pid, it) =>
        val c = bConf.value.value
        val filter = prevStr.map(d => new HPath(d, blobName(pid)))
          .filter(b => b.getFileSystem(c).exists(b))
          .map(b => CuckooChain.fromBytes(readBlob(b.getFileSystem(c), b)))
          .getOrElse(CuckooChain.forCapacity(cap))
        var n = 0L
        it.foreach { case (_, h) => if (filter.insert(h)) n += 1 }
        val out = new HPath(outStr, blobName(pid))
        writeBlob(out.getFileSystem(c), out, filter.toBytes)
        (pid, n, filter.numSegments)
      }
      .collect().map { case (pid, n, segs) => pid -> PartStats(n, segs) }
      .toMap
    // carry forward untouched partitions (driver-side, same FS API)
    val fs = outPath.getFileSystem(conf)
    (0 until p).foreach { pid =>
      val out = new HPath(outPath, blobName(pid))
      if (!fs.exists(out)) {
        prevDir.map(d => new HPath(d, blobName(pid)))
          .filter(prev => prev.getFileSystem(conf).exists(prev)) match {
          case Some(prev) =>
            writeBlob(fs, out, readBlob(prev.getFileSystem(conf), prev))
          case None =>
            writeBlob(fs, out, CuckooChain.forCapacity(cap).toBytes)
        }
      }
    }
    touched
  }

  def updateDistributed(spark: org.apache.spark.sql.SparkSession,
                        hashes: org.apache.spark.sql.DataFrame,
                        prevDir: Option[Path], outDir: Path,
                        partitions: Int, capacityPerPartition: Long)
      (implicit d: DummyImplicit): Map[Int, PartStats] =
    updateDistributed(spark, hashes, prevDir.map(_.toString), outDir.toString,
                      partitions, capacityPerPartition)

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
                         outDir: String,
                         partitions: Int, capacityPerPartition: Long)
      : Map[Int, Int] = {
    import spark.implicits._
    val p = CuckooFilter.nextPow2(partitions)
    val bConf  = spark.sparkContext.broadcast(
      new SerConf(spark.sessionState.newHadoopConf()))
    val outStr = outDir
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
        val out = new HPath(outStr, blobName(pid))
        writeBlob(out.getFileSystem(bConf.value.value), out, chain.toBytes)
        (pid, chain.numSegments)
      }
      .collect().toMap
  }

  def compactDistributed(spark: org.apache.spark.sql.SparkSession,
                         allHashes: org.apache.spark.sql.DataFrame,
                         outDir: Path,
                         partitions: Int, capacityPerPartition: Long)
      (implicit d: DummyImplicit): Map[Int, Int] =
    compactDistributed(spark, allHashes, outDir.toString,
                       partitions, capacityPerPartition)
}
