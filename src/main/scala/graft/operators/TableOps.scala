package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lakehouse table maintenance: the MERGE / compaction / history ops a
  * snapshot-committed corpus store needs once it lives for months —
  * the operational complement of [[graft.state.Snapshots]] (which gives
  * atomicity) and the frontier's append-only seen set (which gives
  * immutability). All three are single-shuffle column plans.
  */
object TableOps {

  /** MERGE (upsert + delete): apply a change batch to a base table —
    * the Iceberg/Delta `MERGE INTO` shape a recrawl needs when a page's
    * record must be REPLACED (new digest) or REMOVED (410/robots) and
    * append-only semantics won't do. `changes` carries `opCol` with
    * 'I' / 'U' / 'D'; I and U both land the change row's payload
    * (upsert), D removes the key. One distributed anti join (the
    * J2/url-seen shape — no nested loop, no driver state) plus a
    * union; the changes side is usually dump-sized, the base side
    * corpus-sized, so AQE picks broadcast-anti when it can.
    *
    * Keys must be unique per side (argmax-dedup the change log first
    * — the A0 winner idiom); column sets must match minus `opCol`.
    */
  def mergeUpsert(base: DataFrame, changes: DataFrame,
                  keyCol: String, opCol: String = "op"): DataFrame = {
    val survivors = base.join(
      changes.select(col(keyCol)), Seq(keyCol), "left_anti")
    survivors.unionByName(
      changes.filter(col(opCol) =!= "D").drop(opCol)
        .select(survivors.columns.map(col): _*))
  }

  /** Compaction planning: assign small files to target-sized output
    * bins — the OPTIMIZE pass that keeps a 100 TB table from dissolving
    * into millions of KB-files (every append/upsert above makes some).
    * Deterministic rule: within a directory, in file-id order, bin =
    * floor(cumulative-size-before / target) — the crossing file ships
    * with its bin (the host-budget idiom), so every bin lands within
    * one file of `target` and the plan is a pure function of the
    * listing. The window is keyed by directory — bounded by a dir's
    * file count, never by table size — which matches how table formats
    * compact (per partition directory).
    */
  def compactionPlan(files: DataFrame, targetBytes: Long,
                     dirCol: String = "dir",
                     fileCol: String = "file_id",
                     sizeCol: String = "size"): DataFrame = {
    val w = Window.partitionBy(col(dirCol)).orderBy(asc(fileCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    files.withColumn("__cum",
        coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .withColumn("bin",
        ((col("__cum") - pmod(col("__cum"), lit(targetBytes)))
          / lit(targetBytes)).cast("long"))
      .drop("__cum")
  }

  /** Rendezvous (highest-random-weight) shard assignment: each key
    * goes to the node with the largest md5(node ':' key) — the
    * stateless partitioner for serving-layer routing (seen-set shards,
    * index shards) whose defining property hash-mod lacks: adding or
    * removing a node moves ONLY the keys whose winner changed (~1/N of
    * them), not a full reshuffle. Pure column arithmetic: N weight
    * expressions + one greatest + a CASE — no join, no shuffle at all;
    * md5-hex string comparison IS the weight order (same discipline as
    * the sketch registers), so any engine replays it byte-for-byte.
    */
  def rendezvousAssign(df: DataFrame, keyCol: String,
                       nodes: Seq[String]): DataFrame = {
    require(nodes.nonEmpty && nodes.distinct.size == nodes.size,
      "rendezvousAssign needs distinct nodes")
    def weight(n: String): Column =
      md5(concat(lit(n), lit(":"), col(keyCol).cast("string")))
    val best = nodes.map(weight).reduce(greatest(_, _))
    val assign = nodes.foldRight(lit(null).cast("string")) { (n, e) =>
      when(weight(n) === best, lit(n)).otherwise(e)
    }
    df.withColumn("node", assign)
  }

  /** SCD2 history build: turn a change log (key, ts, payload) into
    * validity intervals — (valid_from, valid_to, is_current) — so any
    * past state of the table is one `BETWEEN` filter away (the
    * time-travel read over mutable attributes: a URL's quality score /
    * robots verdict as of dump N). One lead() per key ordered by ts;
    * `valid_to` is exclusive (the next version's valid_from), null for
    * the current row. Requires (key, ts) unique — argmax-dedup first.
    */
  def scd2Intervals(changeLog: DataFrame, keyCol: String,
                    tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(asc(tsCol))
    changeLog
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Snapshot-retention planning (the expire-snapshots policy run as a
    * query BEFORE anything is deleted): keep the `keepLast` most
    * recent snapshots unconditionally, plus the FIRST snapshot of each
    * UTC day for time-travel anchors; everything else is expirable.
    * Ordering is (epoch, snap_id) so equal-timestamp snapshots resolve
    * identically on any engine. One global recency window over the
    * snapshot MANIFEST (hundreds of rows however big the data) + one
    * day-keyed window.
    *
    * Output: (snapCol, epochCol, keep, reason ∈
    * recent|day_anchor|expired; recent wins the label when both
    * apply).
    */
  def retentionPlan(snapshots: DataFrame, snapCol: String,
                    epochCol: String, keepLast: Int): DataFrame = {
    require(keepLast >= 1)
    val recency = Window.orderBy(col(epochCol).desc, col(snapCol).desc)
    val day = floor(col(epochCol) / 86400L)
    val dayW = Window.partitionBy(day)
      .orderBy(col(epochCol), col(snapCol))
    snapshots
      .withColumn("__recent", row_number().over(recency) <= keepLast)
      .withColumn("__anchor", row_number().over(dayW) === 1)
      .withColumn("keep", col("__recent") || col("__anchor"))
      .withColumn("reason",
        when(col("__recent"), lit("recent"))
          .when(col("__anchor"), lit("day_anchor"))
          .otherwise(lit("expired")))
      .drop("__recent", "__anchor")
  }
}
