package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl revisit policies: adaptive refresh scheduling (when to
  * re-fetch a URL) and WARC revisit-record dedup (what to store when a
  * re-fetch returns identical content). Companions to [[HostRank]] on
  * the frontier's priority side — together they close the loop the
  * reference leaves to its operator (cc_corpus re-downloads dumps
  * wholesale; a continuous crawler schedules and dedups revisits).
  */
object CrawlPolicy {

  /** Adaptive per-URL refresh schedule (the Cho/Garcia-Molina-style
    * multiplicative policy): walk each URL's fetch history in time
    * order; a content change halves the revisit interval (floor
    * `minIntervalS`), an unchanged fetch doubles it (cap
    * `maxIntervalS`), starting from `initIntervalS` after the first
    * fetch. Intervals use shift/multiply on Longs only — the DuckDB
    * replay's `//2` chain is bit-identical.
    *
    * Input: one row per fetch (urlCol, epochCol seconds, versionCol —
    * any content fingerprint; equality means unchanged). Output per
    * URL: (urlCol, n_fetches, n_changes, interval_s, next_due_epoch).
    *
    * Scale shape: one groupBy on the URL key; each URL's history is
    * collected and folded inside its group (bounded by per-URL fetch
    * count, never by corpus size — the same per-key sequential-fold
    * decomposition as Curation.packSequences).
    */
  def refreshSchedule(fetches: DataFrame,
                      initIntervalS: Long = 86400L,
                      minIntervalS: Long = 3600L,
                      maxIntervalS: Long = 1209600L,
                      urlCol: String = "url",
                      epochCol: String = "fetch_epoch",
                      versionCol: String = "version"): DataFrame = {
    require(minIntervalS <= initIntervalS && initIntervalS <= maxIntervalS)
    // version keeps its OWN type (md5 strings are the natural
    // fingerprint) — casting it would silently null out non-numeric
    // versions and read as "never changed"
    val vType = fetches.select(col(versionCol)).schema.head.dataType
    val hist = fetches
      .groupBy(urlCol)
      .agg(array_sort(collect_list(
        struct(col(epochCol).cast("long").as("e"),
               col(versionCol).as("v")))).as("h"))
    // fold state: (interval, last epoch, prev version, changes); the
    // first element seeds state (null version — the `first` branch is
    // decided before `changed` is read), later elements apply the
    // halve/double rule. Interval arithmetic is all-Long (shiftright ==
    // // on non-negatives).
    val zero = struct(lit(-1L).as("i"), lit(0L).as("e"),
      lit(null).cast(vType).as("v"), lit(0L).as("c"))
    val step = (acc: org.apache.spark.sql.Column,
                x: org.apache.spark.sql.Column) => {
      val first = acc.getField("i") === -1L
      val changed = x.getField("v") =!= acc.getField("v")
      val halved = greatest(lit(minIntervalS),
        shiftright(acc.getField("i"), 1))
      val doubled = least(lit(maxIntervalS), acc.getField("i") * 2)
      struct(
        when(first, lit(initIntervalS))
          .otherwise(when(changed, halved).otherwise(doubled)).as("i"),
        x.getField("e").as("e"),
        x.getField("v").as("v"),
        (acc.getField("c") +
          when(!first && changed, 1L).otherwise(0L)).as("c"))
    }
    hist.select(col(urlCol),
        size(col("h")).cast("long").as("n_fetches"),
        aggregate(col("h"), zero, step).as("s"))
      .select(col(urlCol), col("n_fetches"),
        col("s.c").as("n_changes"),
        col("s.i").as("interval_s"),
        (col("s.e") + col("s.i")).as("next_due_epoch"))
  }

  /** WARC revisit-record dedup (the CDX `revisit` semantics Common
    * Crawl applies at capture time): for each content digest, the
    * earliest capture — (epoch, url) order — stays a full `response`
    * record; every later capture becomes a `revisit` record pointing at
    * the original's url/epoch, storing no payload. One window over the
    * digest key; no self-join.
    */
  def revisitRecords(captures: DataFrame,
                     urlCol: String = "url",
                     epochCol: String = "fetch_epoch",
                     digestCol: String = "digest"): DataFrame = {
    val w = Window.partitionBy(col(digestCol))
      .orderBy(col(epochCol).asc, col(urlCol).asc)
    val isFirst = row_number().over(w) === 1
    captures.select(col(urlCol), col(epochCol).cast("long").as(epochCol),
        col(digestCol),
        isFirst.as("__f"),
        first(col(urlCol)).over(w).as("__ou"),
        first(col(epochCol).cast("long")).over(w).as("__oe"))
      .select(col(urlCol), col(epochCol), col(digestCol),
        when(col("__f"), "response").otherwise("revisit")
          .as("record_type"),
        when(col("__f"), lit(null).cast("string")).otherwise(col("__ou"))
          .as("refers_to_url"),
        when(col("__f"), lit(null).cast("long")).otherwise(col("__oe"))
          .as("refers_to_epoch"))
  }

  /** Crawler-trap detection: hosts that generate unbounded URL spaces
    * (calendars, session ids, infinite pagination) show up as ONE path
    * template with an exploding distinct-URL count. Each URL's path is
    * generalized — long hex runs first (session tokens contain digits,
    * so hex must collapse before the digit rule), then digit runs —
    * and (host, template) groups exceeding `maxPerTemplate` distinct
    * URLs are flagged.
    *
    * Both regexes stay inside the RE2-safe subset so the DuckDB oracle
    * runs the SAME patterns. Plan: pure regexp columns + one
    * partial-agg groupBy keyed on (host, template) — a trap host's
    * millions of URLs collapse into one group row, so the flag table
    * is tiny and the frontier gates candidates with a broadcast-able
    * anti join (same shape as robots gating).
    */
  def trapTemplates(urls: DataFrame, urlCol: String = "url",
                    maxPerTemplate: Long = 50L): DataFrame = {
    val host = regexp_extract(col(urlCol),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    val path = regexp_extract(col(urlCol),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val template = regexp_replace(
      regexp_replace(path, "[0-9a-f]{8,}", "~"), "[0-9]+", "#")
    urls.select(host.as("host"), template.as("template"),
        col(urlCol).as("u"))
      .groupBy("host", "template")
      .agg(countDistinct(col("u")).as("n_urls"))
      .withColumn("trap", col("n_urls") > maxPerTemplate)
  }

  /** Gate frontier candidates against the flagged templates: drop
    * candidates whose (host, template) is a known trap. The trap table
    * is template-scale (tiny) — AQE broadcasts it.
    */
  def trapGate(candidates: DataFrame, traps: DataFrame,
               urlCol: String = "url"): DataFrame = {
    val host = regexp_extract(col(urlCol),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    val path = regexp_extract(col(urlCol),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val template = regexp_replace(
      regexp_replace(path, "[0-9a-f]{8,}", "~"), "[0-9]+", "#")
    // derived keys under __ names so a candidate frame that already
    // carries host/template columns is never clobbered
    candidates
      .withColumn("__th", host).withColumn("__tt", template)
      .join(traps.filter(col("trap"))
          .select(col("host").as("__th"), col("template").as("__tt")),
        Seq("__th", "__tt"), "left_anti")
      .drop("__th", "__tt")
  }

  /** Diff two crawl dumps by key + content digest: per key, was it
    * `added` (new in cur), `removed` (gone from cur), `changed`
    * (digest differs) or `same` — the change signal the adaptive
    * recrawl schedule (recrawlSchedule) folds over, and the CDX-side
    * complement of the WARC revisit dedup. ONE full-outer equi-join on
    * the key; no windows, no self-join — at 100 TB this is exactly the
    * shuffle the comparison costs, nothing more. Inputs need
    * (keyCol, digestCol) with unique keys per dump.
    */
  def dumpDiff(prev: DataFrame, cur: DataFrame,
               keyCol: String = "url",
               digestCol: String = "digest"): DataFrame =
    prev.select(col(keyCol), col(digestCol).as("__prev"))
      .join(cur.select(col(keyCol), col(digestCol).as("__cur")),
        Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("__prev").isNull, "added")
          .when(col("__cur").isNull, "removed")
          .when(col("__prev") === col("__cur"), "same")
          .otherwise("changed").as("status"))

  /** Soft-404 title/heading patterns: a page that answers HTTP 200 but
    * IS an error page — the corpus poison a status filter cannot see
    * (CMSes and CDNs routinely 200 their error pages). RE2-safe, both
    * engines run the identical regex.
    */
  val Soft404Pattern: String =
    "(?i)<(?:title|h1)>[^<]*(?:404|page not found|not found" +
      "|no longer (?:exists|available)|page does not exist)"

  /** Per-page fetch verdict: `soft404` (200-but-error-page), `gone`
    * (hard >= 400 status OR soft404) — the flag the recrawl scheduler
    * and the corpus filter both consume. Pure codegen'd columns.
    */
  def soft404Gate(pages: DataFrame, statusCol: String = "status",
                  htmlCol: String = "html"): DataFrame =
    pages
      .withColumn("soft404",
        col(statusCol) === 200 && col(htmlCol).rlike(Soft404Pattern))
      .withColumn("gone", col(statusCol) >= 400 || col("soft404"))

  /** Mirror-host detection (the Bharat/Broder 1999 problem): host pairs
    * whose document sets overlap by content digest — a crawler that
    * recognizes mirrors fetches each corpus once and maps the rest,
    * instead of paying bandwidth for every replica. Output: one row per
    * unordered host pair with >= `minShared` shared digests, the pair's
    * shared count, each host's digest count, and
    * `mirror_score = shared / min(|A|, |B|)` (1.0 = one side is a full
    * mirror of the other).
    *
    * Scale shape: (host, digest) distinct is ONE shuffle; the pair
    * self-join is keyed by digest, and its blowup is bounded by the
    * `maxHostsPerDigest` guard — a digest on more hosts than that is
    * boilerplate (empty pages, error bodies, shared banners), not
    * mirror evidence, and would otherwise contribute k*(k-1)/2 pairs.
    * Dropped digests leave BOTH the pair join and the per-host
    * denominators, so the score stays a ratio over one universe.
    */
  def mirrorHosts(docs: DataFrame, minShared: Long = 2,
                  maxHostsPerDigest: Int = 8,
                  hostCol: String = "host",
                  digestCol: String = "digest"): DataFrame = {
    require(minShared >= 1 && maxHostsPerDigest >= 2)
    val hd = docs.select(col(hostCol).as("host"),
      col(digestCol).as("digest")).distinct()
    val keep = hd.groupBy("digest").agg(count(lit(1)).as("__nh"))
      .where(col("__nh") <= maxHostsPerDigest)
      .select("digest")
    val k = hd.join(keep, Seq("digest"), "left_semi")
    val sz = k.groupBy("host").agg(count(lit(1)).as("n"))
    val pairs = k.select(col("digest"), col("host").as("host_a"))
      .join(k.select(col("digest"), col("host").as("host_b")), Seq("digest"))
      .where(col("host_a") < col("host_b"))
      .groupBy("host_a", "host_b").agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
    pairs
      .join(sz.select(col("host").as("host_a"), col("n").as("n_a")), "host_a")
      .join(sz.select(col("host").as("host_b"), col("n").as("n_b")), "host_b")
      .select(col("host_a"), col("host_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        round(col("n_shared").cast("double") / least(col("n_a"), col("n_b")),
          6).as("mirror_score"))
  }

  /** Post-hoc politeness audit of a fetch log: per host, the
    * inter-request gap profile and how many gaps violated
    * `minDelayS` — the compliance check you run over yesterday's crawl
    * before believing the scheduler. Rows order by (epoch, orderCol)
    * inside each host (supply a unique orderCol for engine-exact
    * ordering under equal epochs). One lag window + one agg, both
    * keyed by host.
    *
    * Output: (hostCol, n_fetches, n_gaps, min_gap_s, mean_gap_s 4dp,
    * n_violations).
    */
  def politenessAudit(fetches: DataFrame, hostCol: String = "host",
                      epochCol: String = "fetch_epoch",
                      orderCol: String = "ord",
                      minDelayS: Long = 5L): DataFrame = {
    val w = Window.partitionBy(col(hostCol))
      .orderBy(col(epochCol), col(orderCol))
    fetches
      .withColumn("__gap", col(epochCol) - lag(col(epochCol), 1).over(w))
      .groupBy(col(hostCol))
      .agg(
        count(lit(1)).as("n_fetches"),
        count(col("__gap")).as("n_gaps"),
        min(col("__gap")).as("min_gap_s"),
        round(avg(col("__gap")), 4).as("mean_gap_s"),
        sum(when(col("__gap") < minDelayS, 1L).otherwise(0L))
          .as("n_violations"))
  }

  /** Exponentially-weighted fetch-volume forecast per key (capacity
    * planning across dumps): fold e ← (num·x + (den−num)·e)/den over
    * the per-`tCol` counts in time order, seeded with the first
    * observation. The fold runs inside one array column per key
    * (sort_array(collect_list) — a key's history is dumps, not rows,
    * so the list is tiny at any corpus scale), and the oracle replays
    * the identical IEEE op sequence as a recursive CTE.
    *
    * Output: (keyCol, n_points, forecast 4dp).
    */
  def ewmaForecast(counts: DataFrame, keyCol: String, tCol: String,
                   xCol: String, num: Int = 1, den: Int = 4): DataFrame = {
    require(num > 0 && den > num, "need 0 < num < den")
    val seqd = counts.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col(tCol).as("t"),
        col(xCol).cast("double").as("x")))).as("xs"))
    val e = aggregate(col("xs"), lit(null).cast("double"),
      (acc, s) => when(acc.isNull, s("x"))
        .otherwise((s("x") * num + acc * (den - num)) / den))
    seqd.select(col(keyCol),
      size(col("xs")).cast(org.apache.spark.sql.types.LongType)
        .as("n_points"),
      round(e, 4).as("forecast"))
  }

  /** Per-URL change-rate estimation (Cho & Garcia-Molina 2003, the
    * bias-corrected Poisson estimator): from a URL's fetch history of
    * (epoch, version-fingerprint) observations, estimate changes/day
    * λ̂ = −ln((n − x + 0.5)/(n + 0.5)) / Ī  (n revisits, x of them
    * changed, Ī mean inter-fetch gap) and derive the λ-optimal revisit
    * interval 1/λ̂ clamped to [minIntervalS, maxIntervalS]. This is
    * the PRINCIPLED companion to [[refreshSchedule]]'s reactive
    * halving/doubling: the AIMD walk adapts with no model; this one
    * estimates the underlying rate, which a frontier uses to rank
    * whole hosts by expected staleness.
    *
    * History rows order by (epoch, orderCol) — supply a unique
    * orderCol so equal-epoch observations compare identically on any
    * engine. URLs with fewer than 2 fetches carry no rate evidence and
    * are dropped. One window + one groupBy, both keyed by URL.
    *
    * Output: (urlCol, n_revisits, n_changes, mean_gap_s, lambda_day
    * 6dp, next_s, due_epoch).
    */
  def changeRate(fetches: DataFrame, urlCol: String = "url",
                 epochCol: String = "fetch_epoch",
                 versionCol: String = "version",
                 orderCol: String = "ord",
                 minIntervalS: Long = 3600L,
                 maxIntervalS: Long = 1209600L): DataFrame = {
    val w = Window.partitionBy(col(urlCol))
      .orderBy(col(epochCol), col(orderCol))
    val seq0 = fetches.withColumn("__prev",
      lag(col(versionCol), 1).over(w))
    val agg = seq0.groupBy(col(urlCol)).agg(
      (count(lit(1)) - 1).as("n_revisits"),
      sum(when(col("__prev").isNotNull &&
        col(versionCol) =!= col("__prev"), 1L).otherwise(0L))
        .as("n_changes"),
      min(col(epochCol)).as("__e0"),
      max(col(epochCol)).as("__e1"))
      // <2 fetches or zero elapsed time carry no rate evidence
      .filter(col("n_revisits") >= 1 && col("__e1") > col("__e0"))
    val n = col("n_revisits")
    val x = col("n_changes")
    val ibar = (col("__e1") - col("__e0")) * lit(1.0) / n
    val lam = -log((n - x + lit(0.5)) / (n + lit(0.5))) / ibar
    agg
      .withColumn("mean_gap_s", round(ibar, 4))
      .withColumn("lambda_day", round(lam * lit(86400.0), 6))
      .withColumn("next_s",
        when(x === 0, lit(maxIntervalS))
          .otherwise(least(lit(maxIntervalS),
            greatest(lit(minIntervalS),
              floor(lit(1.0) / lam).cast("long")))))
      .withColumn("due_epoch", col("__e1") + col("next_s"))
      .select(col(urlCol), col("n_revisits"), col("n_changes"),
        col("mean_gap_s"), col("lambda_day"), col("next_s"),
        col("due_epoch"))
  }
}
