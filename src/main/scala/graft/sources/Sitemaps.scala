package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap ingestion for the frontier: the seed channel a continuous
  * crawler reads besides the index dumps the reference consumes
  * (robots.txt `Sitemap:` lines — which `Frontier.parseRobots` already
  * surfaces — point here). Parses both document kinds from the
  * sitemaps.org protocol: `<urlset>` page entries (url + lastmod) and
  * `<sitemapindex>` child-sitemap pointers, as pure codegen'd regex
  * columns — one row per entry after a single explode, no XML library,
  * no UDF.
  */
object Sitemaps {

  /** Minimal XML entity decode for `<loc>` payloads (the five
    * predefined entities; `&amp;` last so it cannot re-activate the
    * others — the standard decode order).
    */
  def xmlUnescape(c: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&apos;" -> "'", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (e, ch)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(e), ch)
    }
  }

  /** Parse sitemap XML documents: input (idCol, xmlCol) → one row per
    * entry (idCol, kind 'url' | 'sitemap', url, lastmod — empty string
    * when the entry carries none). Malformed blocks without a `<loc>`
    * are dropped.
    */
  def parse(sitemaps: DataFrame,
            idCol: String = "sitemap_id",
            xmlCol: String = "xml"): DataFrame = {
    def entries(container: String, tag: String, kind: String) = {
      val inContainer = regexp_extract(col(xmlCol),
        s"<$container>(.*)</$container>", 1)
      sitemaps.select(col(idCol),
          explode(regexp_extract_all(inContainer,
            lit(s"<$tag>(.*?)</$tag>"), lit(1))).as("e"))
        .select(col(idCol), lit(kind).as("kind"),
          xmlUnescape(regexp_extract(col("e"), "<loc>(.*?)</loc>", 1))
            .as("url"),
          regexp_extract(col("e"), "<lastmod>(.*?)</lastmod>", 1)
            .as("lastmod"))
        .where(col("url") =!= "")
    }
    entries("urlset", "url", "url")
      .unionByName(entries("sitemapindex", "sitemap", "sitemap"))
  }
}
