package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spectral embedding analysis: PCA by distributed power iteration —
  * the whitening/compression precursor to every embedding pipeline
  * stage here (IVF, PQ, hyperplane LSH all behave better on
  * decorrelated vectors; the top component's variance share is the
  * standard "are these embeddings collapsed?" health check).
  *
  * Scale shape: the covariance build is one explode + self-join +
  * partial agg keyed by (i, j) — dim² accumulators, corpus never
  * shuffles twice; the iteration state is a dim-row vector frame and
  * every matrix-vector product is a dim²-row join, i.e. model-scale
  * after the single corpus pass. Float discipline follows the k-means
  * oracle: means at 6dp, covariance sums at 6dp, every iterate
  * re-rounded at 8dp, so both engines walk the identical float
  * sequence.
  */
object Spectral {

  /** Mean-centered covariance entries (i, j, c), i/j 1-based, c =
    * round(Σ (xᵢ−μᵢ)(xⱼ−μⱼ), 6) / n kept UNdivided — the power
    * iteration is scale-invariant, so dividing by n is deferred to the
    * variance outputs where it matters.
    */
  def covariance(embeddings: DataFrame, idCol: String = "vec_id",
                 embCol: String = "embedding"): DataFrame = {
    val x = embeddings
      .select(col(idCol).as("__r"),
        posexplode(col(embCol).cast("array<double>"))
          .as(Seq("__i0", "__v")))
      .select(col("__r"), (col("__i0") + 1).as("i"), col("__v").as("v"))
    val mu = x.groupBy("i").agg(round(avg(col("v")), 6).as("mu"))
    val cx = x.join(broadcast(mu), Seq("i"))
      .select(col("__r"), col("i"), (col("v") - col("mu")).as("x"))
    cx.as("a").join(cx.as("b"), col("a.__r") === col("b.__r"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(round(sum(col("a.x") * col("b.x")), 6).as("c"))
  }

  /** Top principal component by `iters` power iterations from the
    * all-ones start: returns one row per dimension (idx, loading) plus
    * the Rayleigh eigenvalue and its share of total variance (both
    * identical on every row — flat schema keeps the oracle a plain
    * table compare). Sign convention: the all-ones start fixes it.
    */
  def pcaTop(embeddings: DataFrame, iters: Int = 5,
             idCol: String = "vec_id",
             embCol: String = "embedding"): DataFrame = {
    val sess = embeddings.sparkSession
    import sess.implicits._
    val cov = covariance(embeddings, idCol, embCol).localCheckpoint()
    val dim = cov.agg(max("i")).head().getInt(0)
    var v: DataFrame = (1 to dim).map(i => (i, 1.0)).toDF("j", "vj")
    for (_ <- 1 to iters) {
      val w = cov.join(broadcast(v), Seq("j"))
        .groupBy("i").agg(round(sum(col("c") * col("vj")), 8).as("w"))
      val nrm = w.agg(round(sqrt(sum(col("w") * col("w"))), 8).as("n"))
      v = w.crossJoin(broadcast(nrm))
        .select(col("i").as("j"), round(col("w") / col("n"), 8).as("vj"))
        .localCheckpoint()
    }
    // Rayleigh quotient v'Cv (v is unit-norm) and the variance share
    val eig = cov
      .join(broadcast(v.select(col("j").as("i"), col("vj").as("vi"))),
        Seq("i"))
      .join(broadcast(v), Seq("j"))
      .agg(round(sum(col("c") * col("vi") * col("vj")), 6).as("e"))
    val trace = cov.filter(col("i") === col("j"))
      .agg(round(sum(col("c")), 6).as("t"))
    v.select(col("j").cast("long").as("idx"), col("vj").as("loading"))
      .crossJoin(broadcast(eig)).crossJoin(broadcast(trace))
      .select(col("idx"), col("loading"),
        round(col("e"), 6).as("eigenvalue"),
        round(col("e") / col("t"), 6).as("var_frac"))
  }
}
