package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Redirect-chain resolution: each crawled URL with a 3xx response
  * carries one `src -> dst` edge; before the frontier enqueues
  * anything, every source must resolve to its TERMINAL destination
  * (the URL that actually serves content), with loops and
  * over-long chains flagged instead of followed forever — the crawl
  * policy every production fetcher applies (browsers and crawlers cap
  * at ~10–20 hops).
  *
  * Scale shape: the naive per-hop loop is `maxHops` sequential joins —
  * each a full shuffle of the whole edge set. This uses pointer
  * doubling instead: after round r every pointer has advanced
  * min(2^r, distance-to-terminal) hops, so log2(maxHops) self-joins
  * replace maxHops chained ones. Each round is one hash shuffle keyed
  * by node id; a redirect node has exactly ONE successor, so the join
  * is skew-free by construction (no key ever has more than one build
  * row). No driver-side state, no collect.
  *
  * Semantics: `resolved` iff the terminal is reached within `maxHops`
  * hops (exact hop count returned); loops and longer chains come back
  * `resolved=false` with null final/hops — indistinguishable by
  * design, a crawler drops both. `edges` must be functional (one
  * outgoing edge per src); pre-aggregate otherwise.
  */
object Redirects {

  def resolveRedirects(edges: DataFrame,
                       srcCol: String = "src",
                       dstCol: String = "dst",
                       maxHops: Int = 16): DataFrame = {
    require(maxHops >= 1, "maxHops must be >= 1")
    val rounds = math.ceil(math.log(maxHops.toDouble) / math.log(2.0)).toInt
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // invariant after round r: done=true  => cur is terminal, hops exact;
    //                          done=false => walked exactly 2^r hops
    var ptr = e.select(col("src"), col("dst").as("cur"),
      lit(1L).as("hops"), lit(false).as("done"))
    for (_ <- 1 to rounds) {
      val b = ptr.select(col("src").as("b_src"), col("cur").as("b_cur"),
        col("hops").as("b_hops"), col("done").as("b_done"))
      ptr = ptr
        .join(b, ptr("cur") === b("b_src"), "left")
        .select(
          col("src"),
          when(col("done") || col("b_src").isNull, col("cur"))
            .otherwise(col("b_cur")).as("cur"),
          when(col("done") || col("b_src").isNull, col("hops"))
            .otherwise(col("hops") + col("b_hops")).as("hops"),
          // a join miss means cur has no outgoing edge — terminal
          (col("done") || col("b_src").isNull ||
            coalesce(col("b_done"), lit(false))).as("done"))
    }
    // distance == 2^rounds exactly: the walk stopped ON the terminal but
    // never looked up its (absent) successor — one narrow terminal check
    val srcs = e.select(col("src").as("t_src")).distinct()
    val closed = ptr
      .join(srcs, ptr("cur") === srcs("t_src"), "left")
      .select(col("src"), col("cur"), col("hops"),
        (col("done") || col("t_src").isNull).as("done"))
    // 2^rounds may exceed maxHops when it is not a power of two: a chain
    // that terminates in (maxHops, 2^rounds] hops is over the cap and
    // flags as unresolved like a loop would
    val ok = col("done") && col("hops") <= maxHops
    closed
      .select(
        col("src"),
        when(ok, col("cur")).as("final_id"),
        when(ok, col("hops")).as("hops"),
        ok.as("resolved"))
  }
}
