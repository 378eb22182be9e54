package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact substring-overlap deduplication over token windows — the
  * "exact substring dedup" of LLM training-data pipelines (two docs
  * sharing any w-token run are near-certain template/quote duplicates;
  * complements MinHash, which needs whole-doc similarity). No direct
  * reference analogue (cc_corpus dedups whole docs and paragraphs —
  * lsh.py, frequent_paragraphs.py); this fills the window granularity
  * between those two.
  *
  * Fingerprint = md5 of the space-joined w-token window (content-defined,
  * whitespace-normalized), so the DuckDB oracle reproduces it exactly
  * with `md5(array_to_string(tokens[i:i+w], ' '))` — no custom hash to
  * drift.
  *
  * Scale shape: the fingerprint table is ~one row per token (like the
  * LSH band table); everything downstream is hash joins/aggregations on
  * `fp`. The pair form is quadratic per fingerprint bucket — real
  * corpora have mega-buckets (boilerplate windows), so `sharedPairs`
  * caps bucket width and the production keep/drop form (`survivors`)
  * never materializes pairs at all: a doc is dropped iff one of its
  * windows also occurs in a SMALLER doc_id (min-per-bucket join,
  * skew-free partial agg), which is deterministic and
  * partitioning-invariant.
  */
object SubstringDedup {

  /** (doc_id, widx, fp): one md5 fingerprint per w-token window.
    * Requires (doc_id, text); pure codegen columns, no UDF.
    */
  def windowFingerprints(docs: DataFrame, w: Int = 8,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    val nWin = size(toks) - lit(w - 1)
    // guard: Spark's sequence(1, n) is DESCENDING for n < 1 — a short
    // doc would fabricate windows; emit an empty array instead (then
    // posexplode yields no rows)
    val starts = when(nWin >= 1, sequence(lit(1), nWin))
      .otherwise(array().cast("array<int>"))
    // Work split deliberately: the window STRINGS are built inside the
    // array lambda (one row per doc — exploding start indices instead
    // would copy the whole token array into every window row, O(tokens²)
    // bytes per doc), while the md5 runs OUTSIDE the lambda on the
    // exploded window string — higher-order functions are
    // CodegenFallback, so a hash inside transform() evaluates
    // interpreted per window.
    docs.select(
        col(idCol).as("doc_id"),
        posexplode(transform(starts,
          i => array_join(slice(toks, i, lit(w)), " ")))
          .as(Seq("widx", "__wtext")))
      .select(col("doc_id"), col("widx"), md5(col("__wtext")).as("fp"))
  }

  /** Distinct doc pairs sharing >= minShared window fingerprints, with
    * the shared-window count. `maxBucket` drops fingerprints occurring
    * in more than that many docs (boilerplate mega-buckets — quadratic
    * blowup for zero dedup signal; the survivors form handles them
    * linearly). Loudly capped: callers at scale read the doc.
    */
  def sharedPairs(docs: DataFrame, w: Int = 8, minShared: Long = 1,
                  maxBucket: Int = 64): DataFrame = {
    val fps = windowFingerprints(docs, w)
      .select("doc_id", "fp").distinct()
    // checkpoint: both self-join sides consume this frame — without it
    // the tokenize+md5 chain (the dominant cost) runs twice
    val small = fps.withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .where(col("n") <= maxBucket).drop("n")
      .localCheckpoint()
    small.alias("x").join(small.alias("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Keep/drop form, linear in the fingerprint table: a doc survives
    * iff none of its windows occurs in any smaller doc_id. min-per-fp
    * is a partial-aggregated groupBy (map-side combine, skew-free);
    * the drop test is one semi join.
    */
  def survivors(docs: DataFrame, w: Int = 8,
                idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val fps = windowFingerprints(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("text")), w)
      .select("doc_id", "fp").distinct()
    val minPer = fps.groupBy("fp").agg(min("doc_id").as("min_id"))
    val dropped = fps.join(minPer, Seq("fp"))
      .where(col("doc_id") > col("min_id"))
      .select("doc_id").distinct()
    docs.join(dropped.withColumnRenamed("doc_id", idCol),
              Seq(idCol), "left_anti")
  }
}
