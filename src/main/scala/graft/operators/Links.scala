package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Outlink extraction — the operator that closes the crawl loop
  * (fetch → extract → resolve → enqueue): `<a href>` targets pulled
  * from fetched HTML and resolved against the page URL so the frontier
  * can ingest them as candidates. The reference never recrawls (it
  * reads the Common Crawl index), so this is frontier-native surface
  * beyond it.
  *
  * Everything is codegen'd regexp/CASE columns inside the RE2-safe
  * subset — the DuckDB oracle replays the identical patterns.
  * Resolution covers the RFC 3986 cases a crawler meets: absolute
  * http(s), protocol-relative, root-relative, and directory-relative
  * with bounded dot-segment removal (`MaxDotSegments` passes of the
  * `x/../` collapse — deeper chains are left unresolved; RE2 has no
  * lookahead, so a segment starting with '.' is not collapsed, which
  * only under-resolves, never corrupts). Non-fetchable schemes
  * (mailto:, javascript:, tel:, data:), fragment-only and empty
  * targets are dropped; fragments are stripped from survivors.
  */
object Links {

  val MaxDotSegments = 4

  /** href attribute values (double- and single-quoted) from an HTML
    * column, entity-decoded the same way the sitemap source decodes
    * loc values (amp last).
    */
  def hrefsCol(html: Column): Column = {
    def dec(c: Column) = graft.sources.Sitemaps.xmlUnescape(c)
    val dq = regexp_extract_all(html,
      lit("(?i)<a\\s[^>]*?href\\s*=\\s*\"([^\"]*)\""), lit(1))
    val sq = regexp_extract_all(html,
      lit("(?i)<a\\s[^>]*?href\\s*=\\s*'([^']*)'"), lit(1))
    transform(concat(dq, sq), c => dec(c))
  }

  /** Resolve one href column against a base-URL column. Returns null
    * for dropped targets (non-fetchable scheme, fragment-only, empty).
    */
  def resolveCol(base: Column, href: Column): Column = {
    val scheme = regexp_extract(base, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
    val host = regexp_extract(base, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    val path = regexp_extract(base,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    // directory of the base path, always '/'-terminated ('' -> '/')
    val baseDir = when(path === "", lit("/"))
      .otherwise(regexp_replace(path, "[^/]*$", ""))
    val joined =
      when(href.rlike("^(?i)(https?)://"), href)
        .when(href.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*:"), lit(null)) // mailto: etc.
        .when(href.startsWith("//"), concat(scheme, lit(":"), href))
        .when(href.startsWith("/"), concat(scheme, lit("://"), host, href))
        .when(href === "" || href.startsWith("#"), lit(null))
        .otherwise(concat(scheme, lit("://"), host, baseDir,
          regexp_replace(href, "^(\\./)+", "")))
    val noFrag = regexp_replace(joined, "#.*$", "")
    // bounded dot-segment removal: each pass collapses every
    // independent 'seg/../'; sequential chains need one pass per level
    (1 to MaxDotSegments).foldLeft(noFrag)((c, _) =>
      regexp_replace(c, "/[^/.][^/]*/\\.\\./", "/"))
  }

  /** (idCol, urlCol, link) — one row per resolved outlink, de-duplicated
    * per page. Explode + pure columns; the only shuffle is the final
    * distinct, keyed on (page, link).
    */
  def outlinks(pages: DataFrame, idCol: String = "page_id",
               urlCol: String = "url",
               htmlCol: String = "html"): DataFrame =
    pages.select(col(idCol), col(urlCol),
        explode(hrefsCol(col(htmlCol))).as("href"))
      .withColumn("link", resolveCol(col(urlCol), col("href")))
      .where(col("link").isNotNull)
      .select(col(idCol), col(urlCol), col("link"))
      .distinct()

  /** Frontier candidates from fetched pages: resolved outlinks with
    * tracking params stripped — ready for the seen-set anti join.
    */
  def frontierCandidates(pages: DataFrame, idCol: String = "page_id",
                         urlCol: String = "url",
                         htmlCol: String = "html"): DataFrame =
    outlinks(pages, idCol, urlCol, htmlCol)
      .select(graft.functions.Urls
        .stripTrackingCol(col("link")).as("url"))
      .distinct()
}
