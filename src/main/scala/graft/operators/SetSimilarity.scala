package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact set-similarity self-join (word-set Jaccard >= t) — the n-gram
  * near-duplicate operator as a scale-safe two-regime plan. A naive
  * word-bucket self-join is quadratic in the document frequency of common
  * words (the "the" bucket explodes); both regimes here bound candidate
  * generation independently of any single token's document frequency:
  *
  *  - **Small sets** (n <= nSmallMax, where floor((1-t)*n) <= 1): J >= t
  *    forces |A\B| <= 1 and |B\A| <= 1, so A∩B is reachable from each set
  *    by deleting at most one element. Emitting a hash of the full set
  *    plus each delete-one subset ("deletion signatures", the k-bounded
  *    symmetric-difference join) makes every qualifying pair collide on
  *    the hash of A∩B — n+1 signatures per set, bucket sizes ~ true
  *    duplicate-cluster sizes.
  *  - **Large sets** (n >= ceil(t*nSmallMax)): AllPairs/PPJoin prefix
  *    filtering — under a global token order (document frequency asc,
  *    token asc) two sets with J >= t share a token among their first
  *    n - ceil(t*n) + 1 tokens (the smallest common token sits in both
  *    prefixes), so candidates come only from prefix-token buckets.
  *
  *  The regimes overlap (length filter: qualifying pairs have sizes
  *  within factor t of each other, so every pair lands wholly inside at
  *  least one regime); the union is de-duplicated before the exact
  *  verification, which computes true Jaccard per candidate pair.
  */
object SetSimilarity {

  /** Verification joins attach the word arrays back to candidate
    * pairs. The planner's size ESTIMATE for the array columns is far
    * above their true bytes, so it falls back to sort-merge and
    * shuffles every candidate pair twice (measured: ~6 s of the 8 s
    * containment chain at sf0.1). Below this row count the set table
    * is certainly broadcastable (≤ ~1M docs × ~300 B of sorted tokens
    * ≈ 300 MB worst-case, fine for executor broadcast); above it the
    * planner's shuffle join is the right call at corpus scale — the
    * decision adapts to the input instead of pinning a local[32]-only
    * hint.
    */
  private val BroadcastSetRows = 1000000L

  private def maybeBroadcast(df: DataFrame, rows: Long): DataFrame =
    if (rows <= BroadcastSetRows) broadcast(df) else df

  /** Near-duplicate pairs with word-set Jaccard >= t, blocked by
    * `blockCol` (pairs are only reported within a block). `items` needs
    * (idCol, blockCol, ws: sorted array<string>, c: long = size(ws)).
    * Returns (a_id, b_id, jac) with a_id < b_id, jac rounded to 4dp.
    */
  def jaccardSelfJoin(items: DataFrame, t: Double,
                      idCol: String = "doc_id",
                      blockCol: String = "source"): DataFrame = {
    require(t > 0.5 && t < 1.0, s"threshold must be in (0.5, 1): $t")
    // largest n with floor((1-t)*n) <= 1, i.e. deletion distance <= 1
    val nSmallMax = math.ceil(2.0 / (1.0 - t)).toInt - 1
    val nLargeMin = math.floor(t * nSmallMax).toInt

    val sets = items.select(col(idCol).as("id"), col(blockCol).as("blk"),
                            col("ws"), col("c"))

    // -- small regime: deletion signatures (full set + delete-one) --
    val DELIM = "\u0001"
    val small = sets.filter(col("c") <= nSmallMax)
    val smallSigs = small.select(
      col("id"), col("blk"),
      explode(concat(
        array(xxhash64(concat_ws(DELIM, col("ws")))),
        transform(sequence(lit(1L), greatest(col("c"), lit(1L))), j =>
          xxhash64(concat_ws(DELIM,
            concat(slice(col("ws"), lit(1), (j - 1).cast("int")),
                   slice(col("ws"), (j + 1).cast("int"),
                         col("c").cast("int")))))))).as("sig"))
    val candSmall = smallSigs.alias("a")
      .join(smallSigs.alias("b"),
            col("a.sig") === col("b.sig") && col("a.blk") === col("b.blk") &&
              col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))

    // -- large regime: prefix filtering under (df asc, token asc) --
    val large = sets.filter(col("c") >= nLargeMin)
    val largeTokens = large.select(col("id"), col("blk"), col("c"),
                                   explode(col("ws")).as("word"))
    val dfreq = largeTokens.groupBy("word").agg(count(lit(1)).as("df"))
    val prefix = largeTokens.join(dfreq, Seq("word"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("id").orderBy(asc("df"), asc("word"))))
      .filter(col("rk") <= col("c") - ceil(col("c") * lit(t)) + 1)
      .select("id", "blk", "word", "c")
    val candLarge = prefix.alias("a")
      .join(prefix.alias("b"),
            col("a.word") === col("b.word") && col("a.blk") === col("b.blk") &&
              col("a.id") < col("b.id") &&
              // length filter: t*na <= nb <= na/t
              col("b.c") * lit(t) <= col("a.c") &&
              col("a.c") * lit(t) <= col("b.c"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))

    val cand = candSmall.unionByName(candLarge).distinct()

    // -- exact verification -- (adaptive set-table broadcast, see
    // maybeBroadcast)
    val nSets = sets.count()
    cand
      .join(maybeBroadcast(sets.select(col("id").as("a_id"),
        col("ws").as("wa"), col("c").as("na")), nSets), Seq("a_id"))
      .join(maybeBroadcast(sets.select(col("id").as("b_id"),
        col("ws").as("wb"), col("c").as("nb")), nSets), Seq("b_id"))
      .withColumn("i", size(array_intersect(col("wa"), col("wb"))).cast(LongType))
      .withColumn("jac",
        round(col("i") * lit(1.0) / (col("na") + col("nb") - col("i")), 4))
      .filter(col("jac") >= t)
      .select(col("a_id").as("a_id"), col("b_id").as("b_id"), col("jac"))
  }

  /** Convenience: word sets from a text column (whitespace tokens,
    * de-duplicated, sorted).
    */
  def wordSets(docs: DataFrame, idCol: String = "doc_id",
               blockCol: String = "source",
               textCol: String = "text"): DataFrame =
    docs.select(col(idCol), col(blockCol),
                array_sort(array_distinct(
                  split(trim(col(textCol)), "\\s+"))).as("ws"))
      .withColumn("c", size(col("ws")).cast(LongType))

  /** Directional containment join: pairs (a, b), a != b, with
    * C(a in b) = |A∩B| / |A| >= t — the "doc a is mostly contained in
    * doc b" detector (quotes, excerpt pages, wrapped reposts) that
    * symmetric Jaccard misses whenever |B| >> |A|. Asymmetric
    * PPJoin-style prefix filter: fix the global (df asc, token asc)
    * token order; if C >= t then A misses at most |A| - ceil(t·|A|)
    * tokens of B, so by pigeonhole one of A's first
    * |A| - ceil(t·|A|) + 1 tokens (its RAREST tokens under the order)
    * is in B. Only that prefix joins — against the candidate-superset
    * side's full token table — so bucket sizes are bounded by the df
    * of rare tokens, never a "the"-bucket quadratic. No symmetric
    * length filter applies (B may be any size); the one valid bound,
    * |B| >= |A∩B| >= t·|A|, is pushed into the candidate join.
    * Verification computes the exact intersection per surviving pair.
    *
    * `items` as for [[jaccardSelfJoin]]: (idCol, blockCol, ws sorted
    * array, c = size). Returns (a_id, b_id, containment) — containment
    * of a IN b, rounded 4dp for display, threshold on the raw ratio.
    */
  def containmentJoin(items: DataFrame, t: Double,
                      idCol: String = "doc_id",
                      blockCol: String = "source"): DataFrame = {
    require(t > 0.5 && t <= 1.0, s"threshold must be in (0.5, 1]: $t")
    val sets = items.select(col(idCol).as("id"), col(blockCol).as("blk"),
                            col("ws"), col("c"))
    val tokens = sets.select(col("id"), col("blk"), col("c"),
                             explode(col("ws")).as("word"))
    val dfreq = tokens.groupBy("word").agg(count(lit(1)).as("df"))
    val prefixA = tokens.join(dfreq, Seq("word"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("id").orderBy(asc("df"), asc("word"))))
      .filter(col("rk") <= col("c") - ceil(col("c") * lit(t)) + 1)
      .select(col("id").as("a_id"), col("blk"), col("word"),
              col("c").as("na"))
    val allB = tokens.select(col("id").as("b_id"), col("blk"),
                             col("word"), col("c").as("nb"))
    val cand = prefixA.join(allB, Seq("blk", "word"))
      .filter(col("a_id") =!= col("b_id") &&
              col("nb") >= col("na") * lit(t))
      .select("a_id", "b_id").distinct()
    // adaptive set-table broadcast into the verification joins (the
    // candidate table is the big side): see maybeBroadcast
    val nSets = sets.count()
    cand
      .join(maybeBroadcast(sets.select(col("id").as("a_id"),
        col("ws").as("wa"), col("c").as("na")), nSets), Seq("a_id"))
      .join(maybeBroadcast(sets.select(col("id").as("b_id"),
        col("ws").as("wb")), nSets), Seq("b_id"))
      .withColumn("i",
        size(array_intersect(col("wa"), col("wb"))).cast(LongType))
      .filter(col("i") * lit(1.0) / col("na") >= t)
      .select(col("a_id"), col("b_id"),
        round(col("i") * lit(1.0) / col("na"), 4).as("containment"))
  }

  /** Classic Jaro similarity (matching window ⌊max/2⌋−1, transposition
    * pairs), the record-linkage staple. Conventions match the
    * widely-deployed C implementations (and DuckDB's builtin, which
    * any SQL oracle will call): either side empty → 0.0 — including
    * BOTH empty — and m = 0 → 0.0.
    */
  def jaro(a: String, b: String): Double = {
    if (a == null || b == null || a.isEmpty || b.isEmpty) return 0.0
    if (a == b) return 1.0
    val window = math.max(0, math.max(a.length, b.length) / 2 - 1)
    val bUsed = new Array[Boolean](b.length)
    val aHit = new Array[Boolean](a.length)
    var m = 0
    var i = 0
    while (i < a.length) {
      val hi = math.min(b.length - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bUsed(j) && a(i) == b(j)) {
          aHit(i) = true; bUsed(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < a.length) {
      if (aHit(i)) {
        while (!bUsed(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    (m.toDouble / a.length + m.toDouble / b.length +
      (m - t / 2.0) / m) / 3.0
  }

  /** Jaro-Winkler: [[jaro]] plus the common-prefix boost
    * l·p·(1−jaro), p = 0.1, prefix capped at 4, applied only above the
    * 0.7 boost threshold — the exact parameterization of the standard
    * implementations (verified value-for-value against DuckDB's
    * builtin in the spec).
    */
  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) j
    else {
      val maxP = math.min(4, math.min(a.length, b.length))
      var l = 0
      while (l < maxP && a(l) == b(l)) l += 1
      j + l * 0.1 * (1 - j)
    }
  }

  private val jwUdf =
    org.apache.spark.sql.functions.udf((a: String, b: String) =>
      jaroWinkler(a, b))

  /** Jaro-Winkler record-linkage pairs: within a block, all (a < b)
    * pairs with similarity ≥ `minSim` (6dp output). Same blocking
    * discipline and loud `maxBucket` guard as [[editNearDupPairs]] —
    * JW is the right metric when the variation is typos and
    * transpositions in SHORT strings (names, titles, citations) where
    * a fixed edit budget misbehaves across lengths.
    */
  def jaroWinklerPairs(df: DataFrame, idCol: String, strCol: String,
                       blockCol: String, minSim: Double,
                       maxBucket: Long = 1000L): DataFrame = {
    require(minSim > 0.0 && minSim <= 1.0)
    val e = df.select(col(idCol).as("id"), col(strCol).as("s"),
      col(blockCol).as("blk"))
    val biggest = e.groupBy("blk").count().agg(max("count")).head()
    val big = if (biggest.isNullAt(0)) 0L else biggest.getLong(0)
    require(big <= maxBucket,
      s"jaroWinklerPairs: largest block has $big rows (> maxBucket=" +
        s"$maxBucket); choose a finer blocking key or raise maxBucket")
    e.alias("a")
      .join(e.alias("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("jw", round(jwUdf(col("a.s"), col("b.s")), 6))
      .filter(col("jw") >= minSim)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"), col("jw"))
  }

  /** Edit-distance near-duplicate pairs over short strings (titles,
    * product names, citation keys — the fuzzy-dedup staple): within a
    * caller-chosen block, all (a < b) pairs at levenshtein ≤ `maxDist`.
    * Codegen'd builtin on both the Spark side and any SQL oracle —
    * unit insert/delete/substitute costs, the classic definition.
    *
    * Blocking carries ALL the scale: the join is quadratic within a
    * block by design, so block on something that bounds group size
    * (normalized first token, sorted-key prefix, an LSH bucket) and
    * the loud `maxBucket` guard rejects skewed blockings instead of
    * melting a stage. Spark 3.5+'s thresholded levenshtein short-
    * circuits, so each comparison is O(len·maxDist), not O(len²).
    */
  def editNearDupPairs(df: DataFrame, idCol: String, strCol: String,
                       blockCol: String, maxDist: Int,
                       maxBucket: Long = 1000L): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val e = df.select(col(idCol).as("id"), col(strCol).as("s"),
      col(blockCol).as("blk"))
    val biggest = e.groupBy("blk").count().agg(max("count")).head()
    val big = if (biggest.isNullAt(0)) 0L else biggest.getLong(0)
    require(big <= maxBucket,
      s"editNearDupPairs: largest block has $big rows (> maxBucket=" +
        s"$maxBucket); choose a finer blocking key or raise maxBucket")
    e.alias("a")
      .join(e.alias("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("dist",
        levenshtein(col("a.s"), col("b.s"), maxDist + 1)
          .cast(org.apache.spark.sql.types.LongType))
      .filter(col("dist") <= maxDist && col("dist") >= 0)
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("dist"))
  }
}
