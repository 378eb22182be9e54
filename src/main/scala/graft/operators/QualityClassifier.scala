package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Model-based quality filtering: a distributed multinomial Naive
  * Bayes text classifier, the counts-based analogue of the linear
  * quality classifiers production pipelines train against a
  * high-quality reference corpus (GPT-3 appendix A's WebText-vs-crawl
  * filter, CCNet's fastText stage). NB is chosen deliberately: its
  * model is nothing but integer count tables (so training is two
  * partial-agg groupBys, like every other model here) and its decision
  * rule reduces to comparing two LONG sums — add-1-smoothed per-token
  * log10 probabilities rounded to 6dp, scaled to exact 1e6 micro-units,
  * summed with the same-discipline prior — so classify() is
  * addition-order-insensitive and reproduces bit-for-bit on any engine
  * (the DuckDB oracle replays it; no float argmax anywhere).
  *
  * Scale shape: the model is vocab-scale (one (w, c_pos, c_neg) row per
  * word — both class counts in ONE table, so scoring pays ONE join on
  * the token key, not one per class); totals are a one-row broadcast.
  * The corpus side is explode → join → per-doc partial agg keyed by the
  * doc id (skew-free: a doc's tokens form one group).
  */
object QualityClassifier {

  private def toksCol(text: Column): Column =
    graft.functions.TextAnalysis.wsTokensLower(text)

  /** Count tables: `words` (w, c_pos, c_neg) over the training corpus;
    * `totals` one row (n_pos, n_neg docs; t_pos, t_neg token totals;
    * v vocabulary size). Lazy plans unless the caller persists.
    */
  final case class Model(words: DataFrame, totals: DataFrame)

  /** Train from a labeled frame (`labelCol` boolean: true = the
    * high-quality/reference class).
    */
  def train(docs: DataFrame, labelCol: String,
            idCol: String = "doc_id",
            textCol: String = "text"): Model = {
    val toks = docs.select(col(labelCol).as("__pos"),
      explode(toksCol(col(textCol))).as("w"))
    val words = toks.groupBy("w").agg(
      sum(when(col("__pos"), 1L).otherwise(0L)).as("c_pos"),
      sum(when(col("__pos"), 0L).otherwise(1L)).as("c_neg"))
    // doc counts are computed EAGERLY (one cheap agg over the labeled
    // frame, no explode): an empty class would otherwise surface as
    // log10(0) = -Inf priors casting to Long.MinValue — confidently
    // garbage predictions instead of an error.
    val dc = docs.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
      sum(when(col(labelCol), 0L).otherwise(1L)).as("n_neg")).head()
    val (nPos, nNeg) = (dc.getLong(0), dc.getLong(1))
    require(nPos > 0 && nNeg > 0,
      s"QualityClassifier.train: both classes must be non-empty " +
        s"(n_pos=$nPos, n_neg=$nNeg) — check the $labelCol column")
    val totals = words.agg(
      sum("c_pos").as("t_pos"), sum("c_neg").as("t_neg"),
      count(lit(1)).as("v"))
      .select(col("t_pos"), col("t_neg"), col("v"),
        lit(nPos).as("n_pos"), lit(nNeg).as("n_neg"))
    Model(words, totals)
  }

  /** Per-doc (idCol, n_tokens, llr, pred): pred is the all-integer
    * micro-unit comparison (prior + token sums per class), llr the
    * micro-exact log10 likelihood ratio pos-vs-neg rounded for display.
    * Unseen words get the add-1 floor 1/(t_c + v) — no OOV special
    * case, smoothing covers it.
    */
  def classify(docs: DataFrame, model: Model,
               idCol: String = "doc_id",
               textCol: String = "text",
               logRoundDigits: Int = 6,
               llrRoundDigits: Int = 4): DataFrame = {
    val micro = math.pow(10, logRoundDigits)
    def lp(c: Column, t: Column): Column =
      round(log10((coalesce(c, lit(0L)).cast("double") + lit(1.0))
        / (t.cast("double") + col("v").cast("double"))), logRoundDigits)
    def mu(c: Column): Column = round(c * micro).cast(LongType)
    val priorPos = mu(round(log10(col("n_pos").cast("double")
      / (col("n_pos") + col("n_neg")).cast("double")), logRoundDigits))
    val priorNeg = mu(round(log10(col("n_neg").cast("double")
      / (col("n_pos") + col("n_neg")).cast("double")), logRoundDigits))
    docs.select(col(idCol), explode(toksCol(col(textCol))).as("w"))
      .join(model.words, Seq("w"), "left")
      .crossJoin(broadcast(model.totals))
      .groupBy(idCol)
      .agg(count(lit(1)).cast(LongType).as("n_tokens"),
        (sum(mu(lp(col("c_pos"), col("t_pos")))) + first(priorPos))
          .as("__s_pos"),
        (sum(mu(lp(col("c_neg"), col("t_neg")))) + first(priorNeg))
          .as("__s_neg"))
      .select(col(idCol), col("n_tokens"),
        round((col("__s_pos") - col("__s_neg")) / micro, llrRoundDigits)
          .as("llr"),
        (col("__s_pos") > col("__s_neg")).as("pred"))
  }
}
