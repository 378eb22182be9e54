package graft.queries

import graft.Sessions.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.expressions.Window

/** Relational core: aggregation, broadcast joins, semi/anti joins, argmax,
  * windows, sessionization, global sort. These are the Spark-native
  * realizations of the reference's hand-written pipelines (SURVEY.md §2):
  * A0 argmax winners (deduplicate_index_urls.py:135–156), J2/J3 anti/semi
  * joins, A6/A7 statistics, O2 range coalescing (index.py:187–241),
  * O3 crawl-order sort (download_pages.py:145–153).
  *
  * Every aggregate/computed column is aliased identically in the Spark code
  * and the DuckDB oracle SQL; double-valued aggregates are rounded on both
  * sides so value hashing is stable across engines.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // As-of join (point-in-time lookup): every "trade" event picks the
    // latest "quote" (event_id%3==0, pre-aggregated unique per
    // (user, ts)) with ts <= its own, per user. Spark realization =
    // union + ordered carry-forward, ONE shuffle; the oracle is
    // DuckDB's NATIVE ASOF LEFT JOIN — two independent realizations
    // of the operator Spark lacks.
    "q_asof_join" -> { (s, dir) =>
      val ev = table(s, dir, "events")
      val quotes = ev.filter(pmod(col("event_id"), lit(3L)) === 0)
        .groupBy("user_id", "ts").agg(max("value").as("q_value"))
      val trades = ev.filter(pmod(col("event_id"), lit(3L)) =!= 0)
        .select("event_id", "user_id", "ts", "value")
      graft.operators.AsOfJoin.asOf(trades, quotes, "user_id", "ts",
        Seq("ts", "q_value"))
    },

    // Range join: points vs intervals through the bucketed equi-join
    // (one shuffle, no nested loop); the oracle is a plain BETWEEN join.
    "q_range_join" -> { (s, dir) =>
      val ev = table(s, dir, "events")
      val points = ev.filter(pmod(col("event_id"), lit(20L)) =!= 0)
        .select(col("event_id").as("pid"),
          floor(col("value") * 100).cast(LongType).as("v"))
      val ivals = ev.filter(pmod(col("event_id"), lit(20L)) === 0)
        .select(col("event_id").as("iid"),
          pmod(col("event_id") * 7, lit(49000L)).as("lo"))
        .withColumn("hi", col("lo") + pmod(col("iid"), lit(97L)) + 1)
      graft.operators.RangeJoin.rangeJoin(points, ivals,
          "v", "lo", "hi", bucketWidth = 256)
        .select("pid", "v", "iid", "lo", "hi")
    },

    // Rollup/cube: multi-granularity corpus statistics in ONE pass
    // (Spark expands grouping sets before the partial agg — still one
    // shuffle, no per-level rescan). Money stays integer cents (floor,
    // the indexFrame discipline) so sums are order-insensitive.
    "q_rollup_stats" -> { (s, dir) =>
      table(s, dir, "events")
        .select(col("event_type"), pmod(col("user_id"), lit(3L)).as("ub"),
          floor(col("value") * 100).cast(LongType).as("cents"))
        .rollup("event_type", "ub")
        .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"),
          grouping_id().cast(LongType).as("gid"))
    },

    "q_cube_stats" -> { (s, dir) =>
      table(s, dir, "events")
        .select(col("event_type"), pmod(col("user_id"), lit(3L)).as("ub"),
          floor(col("value") * 100).cast(LongType).as("cents"))
        .cube("event_type", "ub")
        .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"),
          grouping_id().cast(LongType).as("gid"))
    },

    // A6/A7-style corpus statistics over the biggest table. Partial+final
    // hash aggregation == the reference's two-phase per-file/global dicts.
    "q_agg_pricing" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc"),
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders")
        )
    },

    // A8 top-n frequency count.
    "q_topk_events" -> { (s, dir) =>
      table(s, dir, "events")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v"))
        .orderBy(desc("n"), asc("event_type"))
        .limit(5)
    },

    // Broadcast-join chain: dims are tiny -> broadcast, fact aggregated.
    // Exact join-size pre-flight from per-key counts (never running
    // the join): customer⋈orders cardinality, the hottest key's
    // output, and the broadcast/salted/shuffle verdict under a tiny
    // broadcast limit so the salted-vs-plain branch is the one the
    // fixture exercises.
    "q_join_estimate" -> { (s, dir) =>
      graft.operators.Layout.joinEstimate(
        table(s, dir, "customer")
          .select(col("c_custkey").as("custkey")),
        table(s, dir, "orders")
          .select(col("o_custkey").as("custkey")),
        Seq("custkey"), parallelism = 32, broadcastRowLimit = 10L)
    },

    "q_join_region_sales" -> { (s, dir) =>
      val cust = table(s, dir, "customer")
      val nat  = table(s, dir, "nation")
      val reg  = table(s, dir, "region")
      val ord  = table(s, dir, "orders")
      ord
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy("r_name")
        .agg(
          count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue")
        )
    },

    // J3/J4-style left-semi join (EXISTS).
    "q_semi_join" -> { (s, dir) =>
      val ord  = table(s, dir, "orders")
      val cust = table(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      ord
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"), "left_semi")
        .select("o_orderkey", "o_custkey")
    },

    // J2-style left-anti join (NOT EXISTS) — the URL-seen filter shape.
    // Customers with no order above the price threshold (non-empty at
    // every SF, unlike "no orders at all").
    "q_anti_join" -> { (s, dir) =>
      val cust = table(s, dir, "customer")
      val ord  = table(s, dir, "orders").filter(col("o_totalprice") > 450000.0)
      cust
        .join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },

    // A0 argmax: per customer keep the latest order; deterministic total
    // tie-break (o_orderdate desc, o_orderkey desc) exactly as the
    // URL-seen winner needs (deduplicate_index_urls.py:135–156).
    "q_argmax_latest_order" -> { (s, dir) =>
      val w = Window
        .partitionBy("o_custkey")
        .orderBy(desc("o_orderdate"), desc("o_orderkey"))
      table(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(
          col("o_custkey"),
          col("o_orderkey").as("latest_orderkey"),
          round(col("o_totalprice"), 2).as("latest_price")
        )
    },

    // Politeness-queue shape: rank per host (user) by priority, emit a
    // bounded number per host (per-host emission quota).
    "q_window_rank" -> { (s, dir) =>
      val w = Window
        .partitionBy("user_id")
        .orderBy(asc("ts"), asc("event_id"))
      table(s, dir, "events")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("user_id", "event_id", "rnk")
    },

    // O2 range coalescing / sessionization: contiguous-run grouping via
    // lag + cumulative sum (index.py:187–241 byte-range coalescing shape).
    "q_sessionize" -> { (s, dir) =>
      val w  = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
      val ev = table(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn(
          "new_sess",
          when(
            col("prev_ts").isNull ||
              (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800),
            1L
          ).otherwise(0L)
        )
      ev.groupBy("user_id")
        .agg(
          sum("new_sess").as("n_sessions"),
          count(lit(1)).as("n_events")
        )
    },

    // O3 crawl-order global sort: total order + stable positions.
    "q_global_sort" -> { (s, dir) =>
      val w = Window.orderBy(asc("ts"), asc("event_id"))
      table(s, dir, "events")
        .orderBy(asc("ts"), asc("event_id"))
        .limit(100)
        .withColumn("ord", row_number().over(w))
        .select("ord", "event_id", "user_id")
    },

    // Distinct/statistics: per event_type distinct users + value stats.
    "q_distinct_stats" -> { (s, dir) =>
      table(s, dir, "events")
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          round(min("value"), 2).as("min_v"),
          round(max("value"), 2).as("max_v")
        )
    },

    // F21 deterministic split: modulo-based Bernoulli stand-in (seeded
    // rand is engine-specific; modulo is portable and partition-invariant).
    "q_split_sample" -> { (s, dir) =>
      table(s, dir, "events")
        .withColumn("bucket", pmod(col("event_id"), lit(10L)))
        .filter(col("bucket") === 0)
        .select("event_id", "user_id", "event_type")
    },

    // Tumbling-window aggregation (streaming-equivalent shape; the same
    // frame is recomputed via Structured Streaming in the test suite).
    "q_tumbling_window" -> { (s, dir) =>
      table(s, dir, "events")
        .withColumn("hour_ts", date_trunc("hour", col("ts")))
        .groupBy("hour_ts", "event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v"))
    },

    // Sliding-FRAME aggregate (trend feature): per-user moving stats
    // over the last 4 events — integer cents sums keep the frame
    // arithmetic exact; avg is one rounded division of exact ints.
    "q_moving_avg" -> { (s, dir) =>
      val w = Window.partitionBy("user_id")
        .orderBy(asc("ts"), asc("event_id"))
        .rowsBetween(-3, 0)
      table(s, dir, "events")
        .withColumn("cents", floor(col("value") * 100).cast(LongType))
        .select(col("event_id"), col("user_id"),
          sum("cents").over(w).as("sum4_cents"),
          count(lit(1)).over(w).as("n4"))
        .withColumn("avg4",
          round(col("sum4_cents").cast("double") / col("n4"), 6))
    },

    // Hopping (sliding) window: Spark's streaming-compatible window()
    // operator (1 h windows every 30 min — each event lands in exactly
    // two); the oracle replays via time_bucket + the two aligned
    // starts. Same float discipline as tumbling: 2dp inputs sum to an
    // exact 2-decimal rational, so round(.,2) is boundary-safe.
    "q_sliding_window" -> { (s, dir) =>
      table(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("sum_v"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH q AS (
           SELECT user_id, ts, max(value) AS q_value
           FROM events WHERE event_id % 3 = 0 GROUP BY 1, 2),
         t AS (
           SELECT event_id, user_id, ts, value
           FROM events WHERE event_id % 3 <> 0)
         SELECT t.event_id, t.user_id, t.ts, t.value,
                q.ts AS r_ts, q.q_value AS r_q_value
         FROM t ASOF LEFT JOIN q
           ON t.user_id = q.user_id AND t.ts >= q.ts""",

    "q_range_join" ->
      """WITH p AS (
           SELECT event_id AS pid, CAST(floor(value * 100) AS BIGINT) AS v
           FROM events WHERE event_id % 20 <> 0),
         i AS (
           SELECT event_id AS iid, (event_id * 7) % 49000 AS lo,
                  (event_id * 7) % 49000 + (event_id % 97) + 1 AS hi
           FROM events WHERE event_id % 20 = 0)
         SELECT p.pid, p.v, i.iid, i.lo, i.hi
         FROM p JOIN i ON p.v BETWEEN i.lo AND i.hi""",

    "q_rollup_stats" ->
      """SELECT event_type, user_id % 3 AS ub, count(*) AS n,
                CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                  AS sum_cents,
                GROUPING(event_type, user_id % 3) AS gid
         FROM events
         GROUP BY ROLLUP (event_type, user_id % 3)""",

    "q_cube_stats" ->
      """SELECT event_type, user_id % 3 AS ub, count(*) AS n,
                CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                  AS sum_cents,
                GROUPING(event_type, user_id % 3) AS gid
         FROM events
         GROUP BY CUBE (event_type, user_id % 3)""",

    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc,
         count(*) AS n_rows,
         count(DISTINCT l_orderkey) AS n_orders
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q_topk_events" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_v
         FROM events GROUP BY event_type
         ORDER BY n DESC, event_type ASC LIMIT 5""",
    "q_join_estimate" ->
      """WITH ka AS (
           SELECT c_custkey AS k, count(*)::BIGINT AS ca
           FROM customer GROUP BY 1),
         kb AS (
           SELECT o_custkey AS k, count(*)::BIGINT AS cb
           FROM orders GROUP BY 1),
         j AS (
           SELECT count(*)::BIGINT AS keys_common,
                  sum(ca * cb)::BIGINT AS join_rows,
                  max(ca * cb)::BIGINT AS max_key_out
           FROM ka JOIN kb USING (k)),
         t AS (
           SELECT (SELECT sum(ca)::BIGINT FROM ka) AS rows_a,
                  (SELECT count(*)::BIGINT FROM ka) AS keys_a,
                  (SELECT sum(cb)::BIGINT FROM kb) AS rows_b,
                  (SELECT count(*)::BIGINT FROM kb) AS keys_b)
         SELECT t.rows_a, t.rows_b, t.keys_a, t.keys_b,
                coalesce(j.keys_common, 0)::BIGINT AS keys_common,
                coalesce(j.join_rows, 0)::BIGINT AS join_rows,
                coalesce(j.max_key_out, 0)::BIGINT AS max_key_out,
                CASE WHEN least(t.rows_a, t.rows_b) <= 10
                       THEN 'broadcast'
                     WHEN j.max_key_out * 32 > j.join_rows * 4
                       THEN 'salted_shuffle'
                     ELSE 'shuffle' END AS strategy
         FROM t, j""",

    "q_join_region_sales" ->
"""SELECT r_name, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS revenue
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name""",
    "q_semi_join" ->
      """SELECT o_orderkey, o_custkey FROM orders
         WHERE EXISTS (SELECT 1 FROM customer
                       WHERE c_custkey = o_custkey
                         AND c_mktsegment = 'BUILDING')""",
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_totalprice > 450000.0)""",
    "q_argmax_latest_order" ->
      """SELECT o_custkey, latest_orderkey, latest_price FROM (
           SELECT o_custkey, o_orderkey AS latest_orderkey,
                  round(o_totalprice, 2) AS latest_price,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders) WHERE rn = 1""",
    "q_window_rank" ->
      """SELECT user_id, event_id, rnk FROM (
           SELECT user_id, event_id,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY ts ASC, event_id ASC) AS rnk
           FROM events) WHERE rnk <= 3""",
    "q_sessionize" ->
      """SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
                count(*) AS n_events
         FROM (
           SELECT user_id,
                  CASE WHEN prev_ts IS NULL
                         OR CAST(floor(epoch(ts)) AS BIGINT)
                            - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
                       THEN 1 ELSE 0 END AS new_sess
           FROM (
             SELECT user_id, ts,
                    lag(ts) OVER (PARTITION BY user_id
                      ORDER BY ts ASC, event_id ASC) AS prev_ts
             FROM events))
         GROUP BY user_id""",
    "q_global_sort" ->
      """SELECT row_number() OVER (ORDER BY ts ASC, event_id ASC) AS ord,
                event_id, user_id
         FROM (SELECT * FROM events ORDER BY ts ASC, event_id ASC LIMIT 100)""",
    "q_distinct_stats" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
         round(min(value), 2) AS min_v, round(max(value), 2) AS max_v
         FROM events GROUP BY event_type""",
    "q_split_sample" ->
      """SELECT event_id, user_id, event_type FROM events
         WHERE event_id % 10 = 0""",
    "q_tumbling_window" ->
      """SELECT date_trunc('hour', ts) AS hour_ts, event_type,
         count(*) AS n, round(sum(value), 2) AS sum_v
         FROM events GROUP BY 1, 2""",

    "q_moving_avg" ->
      """WITH c AS (
           SELECT event_id, user_id, ts,
                  CAST(floor(value * 100) AS BIGINT) AS cents
           FROM events),
         f AS (
           SELECT event_id, user_id,
                  CAST(sum(cents) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS sum4_cents,
                  count(*) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS n4
           FROM c)
         SELECT event_id, user_id, sum4_cents, n4,
                round(CAST(sum4_cents AS DOUBLE) / n4, 6) AS avg4
         FROM f""",

    "q_sliding_window" ->
      """WITH w AS (
           SELECT event_type, value,
                  unnest([time_bucket(INTERVAL '30 minutes', ts),
                          time_bucket(INTERVAL '30 minutes', ts)
                            - INTERVAL '30 minutes']) AS win_start
           FROM events)
         SELECT win_start, event_type, count(*) AS n,
                round(sum(value), 2) AS sum_v
         FROM w GROUP BY 1, 2"""
  )
}
