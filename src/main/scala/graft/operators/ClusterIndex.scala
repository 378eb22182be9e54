package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CC cluster.idx handling (SURVEY.md §2.1 S1, §2.5 O1): parse the
  * index-of-index and prune it to the clusters that can contain a SURT
  * domain pattern — the reference's binary search with predecessor
  * widening (cc_corpus/index.py:136–168) expressed as sargable filters:
  * the prefix match pushes down to the scan (StringStartsWith), and the
  * predecessor is a TakeOrdered(1) over the below-pattern range, so with
  * surt-sorted storage Catalyst prunes row groups instead of bisecting
  * RAM.
  *
  * Comma-joined SURT keys compare identically to the reference's
  * label-tuple comparison because ',' sorts below every label character.
  */
object ClusterIndex {

  /** Parse tab-separated cluster.idx lines:
    * `surt)/path \t timestamp \t file_name \t offset \t length [\t id]`
    * (cc_corpus/index.py:39–59). The surt domain is the part before `)`.
    */
  def parse(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    val parts = split(col(lineCol), "\t")
    lines.select(
      regexp_extract(parts.getItem(0), "^([^)]*)", 1).as("surt"),
      parts.getItem(2).as("file_name"),
      parts.getItem(3).cast(LongType).as("offset"),
      parts.getItem(4).cast(LongType).as("length")
    )
  }

  /** O1: clusters matching `pattern` (pattern is a label-prefix of the
    * cluster domain — subdomains match) plus the single predecessor
    * cluster (a domain may start mid-cluster; index.py:160–163).
    */
  def pruneClusters(clusters: DataFrame, pattern: String): DataFrame = {
    val matching = clusters.filter(
      col("surt") === pattern || col("surt").startsWith(pattern + ","))
    val predecessor = clusters
      .filter(col("surt") < pattern)
      .orderBy(desc("surt"), desc("file_name"), desc("offset"))
      .limit(1)
    matching.unionByName(predecessor).distinct()
  }

  /** Multi-pattern variant, result in (file_name, offset) order
    * (index.py:171–184).
    */
  def pruneClustersMulti(clusters: DataFrame,
                         patterns: Seq[String]): DataFrame =
    patterns.map(pruneClusters(clusters, _))
      .reduce(_ unionByName _)
      .distinct()
      .orderBy(asc("file_name"), asc("offset"))
}
