package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-facing function registry: exposes the engine's scalar functions to
  * `spark.sql(...)` users so the library is usable without the Scala API.
  */
object Registry {

  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_unquote", Urls.unquoteInf _)
    spark.udf.register("graft_host", Urls.host _)
    spark.udf.register("graft_surt", (h: String) => Urls.surtKey(h))
    spark.udf.register("graft_strip_www", Urls.stripWww _)
    spark.udf.register("graft_bare_url", Urls.bareUrl _)
    spark.udf.register("graft_mime_normalize", (m: String) => Mimes.normalize(m))
    spark.udf.register("graft_minhash", (t: String) => MinHashF.signature(t))
    spark.udf.register("graft_minhash_bands",
      (t: String, b: Int) => MinHashF.bandHashes(MinHashF.signature(t), b))
    spark.udf.register("graft_simhash", TextAnalysis.simhash64 _)
    spark.udf.register("graft_shingle_fp",
      (t: String) => TextAnalysis.minShingleHash(t))
    spark.udf.register("graft_est_jaccard",
      (a: Seq[Long], b: Seq[Long]) =>
        MinHashF.estJaccard(a.toArray, b.toArray))
    spark.udf.register("graft_sniff_mime", (b: Array[Byte]) => Mimes.sniff(b))
    spark.udf.register("graft_mime_simplify",
      (m: String) => Mimes.simplify(m))
    spark.udf.register("graft_normalize_content",
      (b: Array[Byte]) => Mimes.normalizeContent(b))
    spark.udf.register("graft_boilerplate_extract",
      (html: String) => Boilerplate.extractLocal(html))
    // the codegen'd native forms (graft_minhash_sig/graft_minhash_bands
    // as Catalyst expressions) register via MinHashExpressions.register
    graft.expressions.MinHashExpressions.register(spark)
  }
}
