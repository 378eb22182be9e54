package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Frontier scheduling: per-host politeness quotas, robots gating and
  * byte-range coalescing (SURVEY.md §7.1 item 3; reference constants §6).
  *
  * Politeness is *data layout*, not threads (§2.7): candidates are ranked
  * per host_key; `wave` is the emission round — one URL per host per wave,
  * so a fetch executor that processes waves in order respects per-host
  * delay budgets, and a mega-host cannot stall a partition (its URLs land
  * in later waves while other hosts' early waves proceed).
  */
object Frontier {

  /** Rank candidates per host by priority; emit at most `quota` per host.
    * `wave` = within-host rank: the politeness emission round.
    *
    * Skew safety: a mega-host would put its every URL into one task's
    * window sort. When the quota is bounded, a salted pre-prune runs
    * first — per (host, salt) keep the top `quota` rows — so the exact
    * final window only sees <= quota * salts rows per host. Any row in a
    * host's true top-quota ranks <= quota within its salt bucket too, so
    * the pre-prune never drops a final survivor: results are identical to
    * the direct window for any total priority order.
    */
  def politenessRank(candidates: DataFrame,
                     hostCol: String,
                     priorityCols: Seq[Column],
                     quota: Int,
                     salts: Int = 16): DataFrame =
    politenessRankEx(candidates, hostCol, priorityCols, quota, salts)._1

  /** As politenessRank, also returning the sort intermediate pinned by
    * the unbounded path (null when the bounded/window path ran); batch
    * drivers should release it via UrlDedup.releaseOrderCache once the
    * result is consumed, mirroring crawlOrderEx.
    */
  def politenessRankEx(candidates: DataFrame,
                       hostCol: String,
                       priorityCols: Seq[Column],
                       quota: Int,
                       salts: Int = 16): (DataFrame, DataFrame) = {
    if (quota >= Int.MaxValue / math.max(salts, 1)) {
      // Unbounded quota: the window below would put a mega-host's EVERY
      // row into one task (no pre-prune bounds it) — straggler/OOM at a
      // skewed host distribution. Exact skew-free path instead.
      val (r, cache) = politenessRankUnbounded(candidates, hostCol, priorityCols)
      (r, cache)
    } else {
      val w = Window.partitionBy(col(hostCol)).orderBy(priorityCols: _*)
      val pruned =
        if (salts <= 1) candidates
        else {
          // bucket assignment only affects which non-survivors are pruned
          // early, never the final result -> a cheap row-id salt is fine
          val wPre = Window.partitionBy(col(hostCol), col("__salt"))
            .orderBy(priorityCols: _*)
          candidates
            .withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
            .withColumn("__prn", row_number().over(wPre))
            .filter(col("__prn") <= quota)
            .drop("__salt", "__prn")
        }
      (pruned
        .withColumn("wave", row_number().over(w))
        .filter(col("wave") <= quota), null)
    }
  }

  /** Exact per-host rank with NO per-host task: global range sort on
    * (host, priority...) makes each host's rows globally contiguous and
    * lets a mega-host SPREAD across many range partitions (boundaries
    * fall inside the host), the opposite of a host-partitioned window.
    * Within a partition the rank is a streaming counter; only the one
    * host that can span each partition boundary needs an offset, so the
    * correction state collected to the driver is O(partitions) — two
    * boundary runs per partition — independent of host skew and host
    * count. The sorted frame is localCheckpoint'ed so the boundary pass
    * and the rank pass observe the same (sampled, hence nondeterministic)
    * range partitioning.
    *
    * Ties in `priorityCols` order get arbitrary-but-deterministic waves
    * (same caveat as row_number over a non-total order).
    */
  private[graft] def politenessRankUnbounded(
      candidates: DataFrame,
      hostCol: String,
      priorityCols: Seq[Column]): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val spark = candidates.sparkSession
    import spark.implicits._
    val sortCols = col(hostCol).asc +: priorityCols
    val sorted  = candidates.orderBy(sortCols: _*).localCheckpoint()
    val schema  = sorted.schema
    val hostIdx = schema.fieldIndex(hostCol)
    // pass 1 (tiny): first and last host run of each partition, with row
    // counts. Interior runs never span a boundary -> never need offsets.
    val boundary: Array[(Int, String, Long, Int)] = sorted
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var firstHost: String = null; var firstCnt = 0L
        var curHost: String = null;   var curCnt = 0L
        var runs = 0
        it.foreach { row =>
          val h = String.valueOf(row.get(hostIdx))
          if (curHost == null || h != curHost) {
            if (runs == 1) { firstHost = curHost; firstCnt = curCnt }
            curHost = h; curCnt = 0L; runs += 1
          }
          curCnt += 1
        }
        if (runs == 0) Iterator.empty
        else if (runs == 1) Iterator((pid, curHost, curCnt, 0))
        else Iterator((pid, firstHost, firstCnt, 0), (pid, curHost, curCnt, 1))
      }(Encoders.tuple(Encoders.scalaInt, Encoders.STRING,
                       Encoders.scalaLong, Encoders.scalaInt))
      .collect()
    // offsets for spanning hosts: a host in >1 partitions is the last run
    // of its first partition and the first (or sole) run of each later
    // one; its offset at partition p = its boundary-run counts in earlier
    // partitions. Hosts interior to one partition never appear here.
    val offsets: Map[Int, Map[String, Long]] = boundary
      .groupBy(_._2)
      .iterator.flatMap { case (host, entries) =>
        val byPid = entries.sortBy(_._1)
        var acc = 0L
        byPid.iterator.map { case (pid, _, cnt, _) =>
          val o = (pid, host, acc); acc += cnt; o
        }.filter(_._3 > 0L)
      }
      .toArray
      .groupBy(_._1)
      .map { case (pid, es) => pid -> es.map(e => e._2 -> e._3).toMap }
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(schema.fields :+ StructField("wave", IntegerType, nullable = false))
    // pass 2: streaming per-run counter + boundary offset; no buffering
    val ranked = sorted.mapPartitions { it =>
      val pid   = org.apache.spark.TaskContext.getPartitionId()
      val offs  = bOffsets.value.getOrElse(pid, Map.empty[String, Long])
      var curHost: String = null
      var n = 0L
      it.map { row =>
        val h = String.valueOf(row.get(hostIdx))
        if (curHost == null || h != curHost) {
          curHost = h
          n = offs.getOrElse(h, 0L)
        }
        n += 1L
        Row.fromSeq(row.toSeq :+ n.toInt)
      }
    }(Encoders.row(outSchema))
    (ranked, sorted)
  }

  /** Politeness schedule: earliest-fetch epoch second per candidate —
    * wave w of a host fetches no earlier than t0 + (w-1) * its
    * crawl-delay (the reference's 1 s/host budget, get_indexfiles.py
    * politeness; robots Crawl-delay can override per host via the
    * delaySeconds column). Pure column arithmetic over politenessRank's
    * `wave`, so the schedule is data, not threads — any fetch executor
    * that respects `not_before_epoch` is polite by construction.
    */
  def scheduleWaves(ranked: DataFrame,
                    t0Epoch: Column,
                    delaySeconds: Column = lit(1L)): DataFrame =
    ranked.withColumn("not_before_epoch",
      t0Epoch + (col("wave") - 1).cast(LongType) * delaySeconds)

  /** RFC 9309 path pattern → anchored Java regex: `*` matches any char
    * run, a trailing `$` anchors the end; everything else is literal
    * (a non-trailing `$` included). Without a trailing `$` the regex is
    * only start-anchored — prefix-style matching.
    */
  def robotsRegex(pattern: String): String = {
    val sb = new StringBuilder("^")
    val endAnchor = pattern.endsWith("$")
    val body = if (endAnchor) pattern.dropRight(1) else pattern
    body.foreach {
      case '*' => sb.append(".*")
      case c if "\\.^$+?(){}[]|".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    if (endAnchor) sb.append('$')
    sb.toString
  }

  private val robotsRegexUdf = udf(robotsRegex _)

  /** J8 robots gating: keep candidates not disallowed by the most
    * specific matching rule for their host (RFC 9309: longest pattern
    * wins, `*`/`$` wildcards supported); hosts with no matching rule are
    * allowed. The rules table is small relative to the frontier →
    * patterns compile to regexes once on the (tiny) rules side, then a
    * broadcast join on host_key, match, and a longest-pattern argmax per
    * candidate. Plain prefix rules (no `*`/`$`) keep the codegen'd
    * startsWith fast path.
    */
  def robotsGate(candidates: DataFrame, rules: DataFrame,
                 urlCol: String = "url",
                 urlPathCol: String = "path"): DataFrame = {
    val compiled = rules
      .withColumn("__wild",
        col("path_prefix").contains("*") || col("path_prefix").endsWith("$"))
      .withColumn("__rx",
        when(col("__wild"), robotsRegexUdf(col("path_prefix"))))
    // Verdict per distinct (host_key, url): longest matching pattern
    // wins; no matching rule -> allowed. Distinct first so the broadcast
    // join and argmax run once per URL, not once per candidate row.
    val verdicts = candidates
      .select(col("host_key"), col(urlCol), col(urlPathCol))
      .distinct()
      .join(broadcast(compiled), Seq("host_key"), "inner")
      .filter(
        when(col("__wild"), regexp_like(col(urlPathCol), col("__rx")))
          .otherwise(col(urlPathCol).startsWith(col("path_prefix"))))
      .groupBy("host_key", urlCol)
      // longest pattern wins; equal-length tie -> allow (RFC 9309 §2.2.2)
      .agg(max_by(col("allow"), struct(length(col("path_prefix")), col("allow")))
        .as("__allowed"))
    candidates
      .join(verdicts, Seq("host_key", urlCol), "left_outer")
      .filter(coalesce(col("__allowed"), lit(true)))
      .drop("__allowed")
  }

  /** O2 byte-range coalescing: group cluster ranges by file, merge
    * byte-contiguous runs (offset == previous end), cap each batch at
    * `maxClusters` (cc_corpus/index.py:187–241; ≤100 clusters/request,
    * get_indexfiles.py:64–70).  Output: one row per (file, batch) with
    * the merged [start, end) range and member count.
    */
  def coalesceRanges(clusters: DataFrame, maxClusters: Int = 100): DataFrame = {
    val w = Window.partitionBy("file_name").orderBy(asc("offset"))
    val runs = clusters
      .withColumn("prev_end", lag(col("offset") + col("length"), 1).over(w))
      .withColumn("is_break",
        when(col("prev_end").isNull || col("prev_end") =!= col("offset"), 1L)
          .otherwise(0L))
      .withColumn("run_id",
        sum(col("is_break")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("pos_in_run",
        row_number().over(
          Window.partitionBy(col("file_name"), col("run_id"))
            .orderBy(asc("offset"))))
      .withColumn("batch_in_run",
        ((col("pos_in_run") - 1) / maxClusters).cast(LongType))
    runs
      .groupBy("file_name", "run_id", "batch_in_run")
      .agg(
        min("offset").as("range_start"),
        max(col("offset") + col("length")).as("range_end"),
        count(lit(1)).as("n_clusters")
      )
  }
}
