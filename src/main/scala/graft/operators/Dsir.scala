package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** DSIR-style data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every raw-corpus
  * document by the log importance ratio of a TARGET distribution over a
  * RAW distribution, both estimated on hashed n-gram features. The
  * downstream sampler (Gumbel top-k in the paper) is the consumer's
  * choice; this operator produces the deterministic part — the weights.
  *
  * Engine-reproducible by construction, like the NB classifier
  * ([[QualityClassifier]]): per-bucket log10 probabilities (add-1
  * smoothing over the fixed bucket space) round to 6dp and scale to
  * exact integer micro-units, so a doc's weight is an
  * addition-order-insensitive Long sum that hashes identically in the
  * DuckDB replay.
  *
  * Scale shape: the model is the bucket table — EXACTLY `buckets` rows
  * (both distributions in one table), a guaranteed broadcast no matter
  * the corpus size, so scoring never shuffles by feature; the only
  * per-doc shuffle is the final doc_id-keyed partial agg. Features are
  * unigrams + bigrams hashed through md5 (hex-prefix arithmetic — pure
  * codegen columns, no UDF).
  */
object Dsir {

  /** Feature bucket of a gram string: first 6 hex chars of md5 as an
    * integer (16^6 values), mod `buckets`. Hex-digit values via
    * character codes — pure arithmetic, identical in the SQL replay.
    */
  def bucketCol(gram: Column, buckets: Int): Column = {
    val hex = md5(gram)
    val v = (1 to 6).map { i =>
      val c = ascii(substring(hex, i, 1))
      when(c >= 97, c - 87).otherwise(c - 48)
    }.reduce((acc, d) => acc * 16 + d)
    pmod(v.cast(LongType), lit(buckets.toLong))
  }

  private def toksCol(text: Column): Column =
    graft.functions.TextAnalysis.wsTokensLower(text)

  /** Per-doc exploded feature buckets: unigrams + bigrams. Bigram
    * strings are built inside the array lambda (cheap concat); the md5
    * runs AFTER explode, outside any HOF, so it stays codegen'd.
    * `carryCols` ride along through the explode (e.g. the training
    * label) so no caller has to join the exploded table back to the
    * corpus — that join would shuffle ~2 tokens-per-doc rows by doc id.
    */
  def features(docs: DataFrame, buckets: Int,
               idCol: String = "doc_id",
               textCol: String = "text",
               carryCols: Seq[String] = Nil): DataFrame = {
    val carried = carryCols.map(col)
    val toks = toksCol(col(textCol))
    val bigrams = expr(
      "transform(slice(__toks, 1, greatest(size(__toks) - 1, 0)), " +
        "(t, i) -> concat(t, ' ', __toks[i + 1]))")
    docs.select(col(idCol) +: toks.as("__toks") +: carried: _*)
      .select(col(idCol) +: explode(concat(col("__toks"), bigrams))
        .as("g") +: carried: _*)
      .select(col(idCol) +: bucketCol(col("g"), buckets).as("b")
        +: carried: _*)
  }

  /** The model: per-bucket counts under the raw corpus and the target
    * subset, plus totals. `targetCol` is a boolean column marking
    * target membership; target rows count toward BOTH distributions
    * (the raw corpus includes them).
    */
  final case class Model(table: DataFrame, buckets: Int)

  def train(docs: DataFrame, targetCol: String,
            buckets: Int = 1024,
            idCol: String = "doc_id",
            textCol: String = "text"): Model = {
    val f = features(
      docs.select(col(idCol), col(textCol), col(targetCol).as("__t")),
      buckets, idCol, textCol, carryCols = Seq("__t"))
    val t = f.groupBy("b").agg(
      count(lit(1)).as("c_raw"),
      sum(when(col("__t"), 1L).otherwise(0L)).as("c_tgt"))
    Model(t, buckets)
  }

  /** Per-doc (idCol, n_feats, llw): llw = Σ_feats (log10 p_target −
    * log10 p_raw) in exact micro-units, displayed /1e6 rounded.
    */
  def weigh(docs: DataFrame, model: Model,
            idCol: String = "doc_id",
            textCol: String = "text",
            logRoundDigits: Int = 6,
            outRoundDigits: Int = 4): DataFrame = {
    val micro = math.pow(10, logRoundDigits)
    val totals = broadcast(model.table.agg(
      sum("c_raw").as("t_raw"), sum("c_tgt").as("t_tgt")))
    def lp(c: Column, t: Column): Column =
      round(log10((coalesce(c, lit(0L)).cast("double") + lit(1.0))
        / (t.cast("double") + lit(model.buckets.toDouble))),
        logRoundDigits)
    val mu = round((lp(col("c_tgt"), col("t_tgt"))
      - lp(col("c_raw"), col("t_raw"))) * micro).cast(LongType)
    features(docs, model.buckets, idCol, textCol)
      .join(broadcast(model.table), Seq("b"), "left")
      .crossJoin(totals)
      .groupBy(idCol)
      .agg(count(lit(1)).cast(LongType).as("n_feats"),
        sum(mu).as("__w"))
      .select(col(idCol), col("n_feats"),
        round(col("__w") / micro, outRoundDigits).as("llw"))
  }
}
