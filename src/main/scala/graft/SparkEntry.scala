package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory) to DataFrame
  * builders over the driver's parquet tables; `oracleSql` holds the
  * equivalent DuckDB SQL for the SQL-expressible subset.
  */
object SparkEntry {

  private val groups: Seq[(Map[String, (SparkSession, String) => DataFrame],
                           Map[String, String])] = Seq(
    (RelationalQueries.defs, RelationalQueries.oracles),
    (CrawlQueries.defs, CrawlQueries.oracles),
    (TextQueries.defs, TextQueries.oracles),
    (PipelineQueries.defs, PipelineQueries.oracles),
    (MiscQueries.defs, MiscQueries.oracles),
    (CurationQueries.defs, CurationQueries.oracles),
    (LmQueries.defs, LmQueries.oracles),
    (SuffixQueries.defs, SuffixQueries.oracles)
  )

  /** Flagship: the end-to-end frontier slice — raw index lines through
    * filter → URL-seen dedup → politeness → crawl-ordered fetch batches
    * with a snapshot commit — on a seeded fixture. Driver smoke-checks
    * rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val table = java.nio.file.Files
      .createTempDirectory("graft-entry").toString
    val lines = graft.fixtures.CrawlFixtures.rawLines(
      graft.fixtures.CrawlFixtures.Params(nRecords = 3000))
    graft.operators.FrontierJob
      .runBatch(spark, lines.toDF(), table, dumpId = "entry")
      .batches
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    groups.map(_._2).reduce(_ ++ _)
}
