package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Public-Suffix-List registered-domain extraction (publicsuffix.org
  * semantics: normal / `*.` wildcard / `!` exception rules; exception
  * prevails, else the match with the most labels; no match falls back
  * to the `*` default = bare TLD). Politeness, host budgets and mirror
  * grouping all want the REGISTERED domain, not the raw host —
  * "a.web.co.uk" and "b.web.co.uk" are one registrant while
  * "web.co.uk" and "web2.co.uk" are two — and getting `*.ck`-style
  * zones wrong miscounts whole countries.
  *
  * Plan shape: hosts explode to their O(labels) suffix candidates
  * (≤ ~6/host), which equi-join the broadcast rule table twice (rule
  * key vs the candidate for normal/exception, vs the candidate's
  * PARENT for wildcards — that turns the one-label-wildcard into an
  * exact key match), then one partial-agg max(struct) per host picks
  * the prevailing rule. The ~10k-rule real PSL broadcasts at <1 MB;
  * nothing here scales with corpus size except the map-side explode.
  */
object PublicSuffix {

  /** Parse PSL rule lines into the (key, kind) join table:
    * kind 'n' normal, 'w' wildcard (key = the anchor under the `*`),
    * 'e' exception (key = the rule without `!`).
    */
  def rulesDf(spark: SparkSession, rules: Seq[String]): DataFrame = {
    import spark.implicits._
    rules.filter(r => r.nonEmpty && !r.startsWith("//")).map { r =>
      if (r.startsWith("!")) (r.drop(1), "e")
      else if (r.startsWith("*.")) (r.drop(2), "w")
      else (r, "n")
    }.toDF("key", "kind")
  }

  /** Append `public_suffix` and `reg_domain` (null when the host IS a
    * public suffix) for `hostCol`, under the given rule table.
    */
  def registeredDomain(df: DataFrame, hostCol: String,
                       rules: DataFrame): DataFrame = {
    val labels = split(col("__h"), "\\.")
    val hosts = df.select(col(hostCol).as("__h")).distinct()
    val cands = hosts
      .select(col("__h"), explode(sequence(lit(1), size(labels))).as("i"))
      .withColumn("__l", split(col("__h"), "\\."))
      .withColumn("s",
        array_join(slice(col("__l"), -col("i"), col("i")), "."))
      .withColumn("p",
        when(col("i") > 1,
          array_join(slice(col("__l"), -(col("i") - 1), col("i") - 1), "."))
          .otherwise(lit("")))
    val direct = cands
      .join(broadcast(rules.filter(col("kind") =!= "w")),
        col("s") === col("key"))
      .select(col("__h"),
        when(col("kind") === "e", lit(1)).otherwise(lit(0)).as("exc"),
        when(col("kind") === "e", col("i") - 1).otherwise(col("i"))
          .as("psn"),
        when(col("kind") === "e", col("p")).otherwise(col("s")).as("ps"))
    val wild = cands
      .join(broadcast(rules.filter(col("kind") === "w")),
        col("p") === col("key"))
      .select(col("__h"), lit(0).as("exc"), col("i").as("psn"),
        col("s").as("ps"))
    val best = direct.unionByName(wild)
      .groupBy(col("__h"))
      .agg(max(struct(col("exc"), col("psn"), col("ps"))).as("m"))
      .select(col("__h"), col("m.psn").as("__psn"), col("m.ps").as("__ps"))
    val hl = split(col(hostCol), "\\.")
    df.join(best, col(hostCol) === col("__h"), "left")
      .withColumn("public_suffix",
        coalesce(col("__ps"), element_at(hl, -1)))
      .withColumn("__n", coalesce(col("__psn"), lit(1)))
      .withColumn("reg_domain",
        when(size(hl) > col("__n"),
          array_join(slice(hl, -(col("__n") + 1), col("__n") + 1), "."))
          .otherwise(lit(null).cast("string")))
      .drop("__h", "__ps", "__psn", "__n")
  }
}
