package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** CCNet-style perplexity filtering (Wenzek et al. 2020's head/middle/
  * tail buckets) over a distributed stupid-backoff bigram LM (Brants et
  * al. 2007) — the web-scale stand-in for KenLM: no normalization pass,
  * so the whole model is three count tables that fall out of partial
  * aggregation. The reference pipeline has no LM filter; this is part
  * of the training-data extension surface (SURVEY.md §2 additions).
  *
  * Scale shape: the model IS data — three count DataFrames plus a
  * one-row totals frame, never driver-side. Training is two partial-agg
  * groupBys over the exploded (prev, w) pair stream (map-side combine;
  * a gram's occurrences only meet at the final count). Scoring is hash
  * joins on gram keys — AQE broadcasts a pruned model that fits, else
  * shuffles both sides on the gram key, which is exactly the join you
  * would run at 100 TB. The per-doc reduction sums exact micro-units
  * (longs), so scores are addition-order-insensitive and reproduce
  * bit-for-bit across engines — the DuckDB oracle replays them.
  *
  * Probability contract (deterministic, oracle-replayed):
  *   S(w | prev) = c(prev,w)/c(prev,*)        if bigram count >= minCount
  *               = alpha * u(w)/N             else if unigram count >= minCount
  *               = alpha / N                  else (OOV floor)
  * with a "<s>" sentinel context for each document's first token, so
  * every position scores through the same three-way CASE. Context
  * denominators c(prev,*) are marginals of the UNPRUNED pair table
  * (probabilities stay <= 1 regardless of pruning). Per-position log10
  * is rounded to 6dp immediately (both engines), scaled to exact 1e6
  * micro-units and summed as longs; the per-doc score is the negative
  * mean log10 (nll — perplexity is 10^nll, monotone, so filtering on
  * nll is filtering on perplexity without cross-engine pow drift).
  */
object NgramLM {

  /** Repo-wide whitespace token semantics, case-folded for LM counts
    * (matches `string_split_regex(trim(lower(text)), '\s+')`).
    */
  private def toksCol(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Sentinel context for document-initial tokens. */
  val Sentinel = "<s>"

  final case class Params(
      alpha: Double = 0.4,
      minCount: Long = 2L,
      logRoundDigits: Int = 6,
      scoreRoundDigits: Int = 4,
      headMax: Double = 1.46,
      midMax: Double = 1.48)

  /** The trained model: bigram counts (prev, w, c) pruned to minCount,
    * context marginals (prev, cc) over the unpruned pair table, unigram
    * counts (w, u) pruned to minCount, and a one-row totals frame
    * (n: total token count as double). All lazy plans over the training
    * frame unless the caller persists them.
    */
  final case class Model(bigrams: DataFrame, contexts: DataFrame,
                         unigrams: DataFrame, totals: DataFrame)

  /** (idCol, prev, w) pair stream: each token paired with its
    * predecessor ("<s>" for position 0). Built as array columns and
    * exploded once — no window, no self-join.
    */
  def pairs(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val t = toksCol(col(textCol))
    docs
      .select(col(idCol),
        explode(zip_with(
          concat(array(lit(Sentinel)), slice(t, lit(1), size(t) - 1)), t,
          (p, w) => struct(p.as("prev"), w.as("w")))).as("pw"))
      .select(col(idCol), col("pw.prev").as("prev"), col("pw.w").as("w"))
  }

  def train(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text", minCount: Long = 2L): Model = {
    val pr  = pairs(docs, idCol, textCol)
    val big = pr.groupBy("prev", "w").agg(count(lit(1)).as("c"))
    Model(
      bigrams  = big.where(col("c") >= minCount),
      contexts = big.groupBy("prev").agg(sum("c").as("cc")),
      unigrams = pr.groupBy("w").agg(count(lit(1)).as("u"))
        .where(col("u") >= minCount),
      totals   = pr.agg(count(lit(1)).cast("double").as("n")))
  }

  /** Per-doc (idCol, n_tokens, nll): negative mean log10 stupid-backoff
    * probability, rounded to scoreRoundDigits for display; the
    * UNROUNDED mean drives `bucketed`'s thresholds (identical integer
    * inputs -> identical doubles on every engine).
    */
  def score(docs: DataFrame, model: Model,
            params: Params = Params(),
            idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val lp = when(col("c").isNotNull,
        round(log10(col("c").cast("double") / col("cc").cast("double")),
          params.logRoundDigits))
      .when(col("u").isNotNull,
        round(log10(lit(params.alpha) * col("u").cast("double") / col("n")),
          params.logRoundDigits))
      .otherwise(round(log10(lit(params.alpha) / col("n")),
        params.logRoundDigits))
    val micro = math.pow(10, params.logRoundDigits)
    pairs(docs, idCol, textCol)
      .join(model.bigrams, Seq("prev", "w"), "left")
      .join(model.contexts, Seq("prev"), "left")
      .join(model.unigrams, Seq("w"), "left")
      .crossJoin(broadcast(model.totals))
      .groupBy(idCol)
      .agg(count(lit(1)).cast(LongType).as("n_tokens"),
           sum(round(lp * micro).cast(LongType)).as("__ms"))
      .select(col(idCol), col("n_tokens"),
        round(-(col("__ms") / micro) / col("n_tokens"),
          params.scoreRoundDigits).as("nll"),
        (-(col("__ms") / micro) / col("n_tokens")).as("__nll_raw"))
  }

  /** Trigram model on top of the bigram one: trigram counts
    * (p2, p1, w, c3) pruned to minCount and their context marginals
    * (p2, p1, cc3) over the unpruned table. Document-initial positions
    * use a double sentinel ((<s>,<s>) for position 0, (<s>, w0) for
    * position 1), so every position scores through the same CASE.
    */
  final case class Model3(base: Model, trigrams: DataFrame,
                          contexts3: DataFrame)

  /** (idCol, p2, p1, w) trigram stream, built like `pairs` — shifted
    * arrays zipped and exploded once, no window/self-join.
    */
  def triples(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val t = toksCol(col(textCol))
    // prepend sentinels, slice back to exactly n: p_k[i] = t[i-k] or <s>.
    // (The arithmetic stays valid for single-token docs, where building
    // the shifted arrays by slice-length subtraction would go negative.)
    val p1 = slice(concat(array(lit(Sentinel)), t), lit(1), size(t))
    val p2 = slice(concat(array(lit(Sentinel), lit(Sentinel)), t),
      lit(1), size(t))
    docs
      .select(col(idCol),
        explode(zip_with(
          zip_with(p2, p1, (a, b) => struct(a.as("p2"), b.as("p1"))), t,
          (pp, w) => struct(pp.getField("p2").as("p2"),
            pp.getField("p1").as("p1"), w.as("w")))).as("g"))
      .select(col(idCol), col("g.p2").as("p2"), col("g.p1").as("p1"),
        col("g.w").as("w"))
  }

  def train3(docs: DataFrame, idCol: String = "doc_id",
             textCol: String = "text", minCount: Long = 2L): Model3 = {
    val tr  = triples(docs, idCol, textCol)
    val tri = tr.groupBy("p2", "p1", "w").agg(count(lit(1)).as("c3"))
    Model3(
      base      = train(docs, idCol, textCol, minCount),
      trigrams  = tri.where(col("c3") >= minCount),
      contexts3 = tri.groupBy("p2", "p1").agg(sum("c3").as("cc3")))
  }

  /** Stupid backoff over the trigram chain: S(w|p2,p1) = c3/cc3 if the
    * trigram survives pruning, else alpha * c2/cc2, else alpha^2 *
    * u(w)/N, else the alpha^2/N OOV floor — one alpha per backoff step
    * (Brants et al. 2007 §3). Same micro-unit reduction and rounding
    * discipline as `score`.
    */
  def score3(docs: DataFrame, model: Model3,
             params: Params = Params(),
             idCol: String = "doc_id",
             textCol: String = "text"): DataFrame = {
    val a  = params.alpha
    val lp = when(col("c3").isNotNull,
        round(log10(col("c3").cast("double") / col("cc3").cast("double")),
          params.logRoundDigits))
      .when(col("c").isNotNull,
        round(log10(lit(a) * col("c").cast("double")
          / col("cc").cast("double")), params.logRoundDigits))
      // alpha^2 as two chained multiplications, never a folded a*a
      // constant: the oracle's DECIMAL literals fold differently, and
      // the per-step form is also what the backoff recursion means
      .when(col("u").isNotNull,
        round(log10(lit(a) * (lit(a) * col("u").cast("double")
          / col("n"))), params.logRoundDigits))
      .otherwise(round(log10(lit(a) * (lit(a) / col("n"))),
        params.logRoundDigits))
    val micro = math.pow(10, params.logRoundDigits)
    triples(docs, idCol, textCol)
      .join(model.trigrams, Seq("p2", "p1", "w"), "left")
      .join(model.contexts3, Seq("p2", "p1"), "left")
      .join(model.base.bigrams.withColumnRenamed("prev", "p1"),
        Seq("p1", "w"), "left")
      .join(model.base.contexts.withColumnRenamed("prev", "p1"),
        Seq("p1"), "left")
      .join(model.base.unigrams, Seq("w"), "left")
      .crossJoin(broadcast(model.base.totals))
      .groupBy(idCol)
      .agg(count(lit(1)).cast(LongType).as("n_tokens"),
           sum(round(lp * micro).cast(LongType)).as("__ms"))
      .select(col(idCol), col("n_tokens"),
        round(-(col("__ms") / micro) / col("n_tokens"),
          params.scoreRoundDigits).as("nll"),
        (-(col("__ms") / micro) / col("n_tokens")).as("__nll_raw"))
  }

  /** CCNet head/middle/tail buckets on fixed nll thresholds (the
    * production shape: thresholds come from a reference-corpus quantile
    * computed once per model, then applied as constants — a data-scale
    * percent_rank would force a global sort for no semantic gain).
    * Comparisons use the unrounded mean.
    */
  def bucketed(scored: DataFrame, params: Params = Params()): DataFrame =
    scored
      .withColumn("bucket",
        when(col("__nll_raw") < params.headMax, "head")
          .when(col("__nll_raw") < params.midMax, "middle")
          .otherwise("tail"))
      .drop("__nll_raw")
}
