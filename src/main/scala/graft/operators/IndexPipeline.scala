package graft.operators

import graft.functions.{Mimes, Urls}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The index acquisition + filtering stage (SURVEY.md §2.1 S1, §2.2
  * F1–F8): raw CC index lines → typed, filtered, per-file sorted entries.
  * All filters are column expressions (whole-stage codegen); the only UDF
  * in the whole stage is the percent-decode fixpoint, and it is not on
  * this path.
  */
object IndexPipeline {

  /** JSON payload schema of an index line (values are strings in the CC
    * index; cast after parse). scripts/filter_index.py:68–77 read_fields.
    */
  val indexJsonSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("filename", StringType),
    StructField("offset", StringType),
    StructField("length", StringType),
    StructField("status", StringType),
    StructField("mime", StringType)
  ))

  /** Parse raw `SURT timestamp {json}` lines into typed fields.
    * Missing status → 0, missing mime → unknown/unknown (read_fields
    * defaults).  Input must carry (file, file_ord, line_ord, line).
    */
  def parseRaw(raw: DataFrame): DataFrame = {
    val json = from_json(
      expr("split(line, ' ', 3)[2]"), indexJsonSchema)
    raw
      .withColumn("j", json)
      .select(
        col("file"), col("file_ord"), col("line_ord"),
        col("j.url").as("url"),
        col("j.filename").as("warc"),
        col("j.offset").cast(LongType).as("offset"),
        col("j.length").cast(LongType).as("length"),
        coalesce(col("j.status").cast(IntegerType), lit(0)).as("status"),
        coalesce(col("j.mime"), lit("unknown/unknown")).as("mime")
      )
      .filter(col("url").isNotNull && col("warc").isNotNull)
  }

  /** F2 basic_filter + F3 mime_filter + F4 http_filter + F5
    * bad_index_filter + F6 per-file stable sort by (domain, url).
    *
    * Output adds `domain` (www-stripped netloc) and replaces `line_ord`
    * with the post-sort in-file position — the processing order that
    * downstream first-wins/strict-greater semantics key on.
    */
  /** `resort = true` reproduces the reference's per-file stable
    * (domain, url) re-sort (F6), which downstream tie-breaks key on —
    * needed for row-identical parity. `resort = false` keeps the raw
    * input order as the processing order (an equally-valid deterministic
    * total order) and skips the per-file shuffle + window entirely —
    * the frontier hot path uses this.
    */
  def filterIndex(parsed: DataFrame,
                  allowedMimes: Set[String] = Mimes.DefaultAllowed,
                  badIndexPatterns: Seq[String] = Seq.empty,
                  resort: Boolean = true): DataFrame = {
    // the reference's robots pattern has no metacharacters beyond the
    // escaped dot — a literal substring test (codegen'd contains, no
    // regex engine) is exactly re.search('/robots\\.txt', url)
    val basic = parsed.filter(
      !col("url").contains("/robots.txt") && col("status") === 200)

    val mimed = basic
      .withColumn("mime", Mimes.normalizeCol(col("mime")))
      .filter(col("mime").isin(allowedMimes.toSeq.sorted: _*))

    val domained = mimed.withColumn("domain", Urls.domainCol(col("url")))

    val badFiltered =
      if (badIndexPatterns.isEmpty) domained
      else {
        val pat = "^" + badIndexPatterns.map(p => s"(?:$p)").mkString("|") + "$"
        // bad_index matches the whole ' '.join(fields) line post-http_filter
        domained.filter(!concat_ws(" ",
          col("domain"), col("url"), col("warc"),
          col("offset").cast(StringType), col("length").cast(StringType),
          col("status").cast(StringType), col("mime")).rlike(pat))
      }

    if (!resort)
      badFiltered.select("domain", "url", "warc", "offset", "length",
                         "status", "mime", "file", "file_ord", "line_ord")
    else {
      // F6: stable per-file sort by (domain, url) — Python sorted() is
      // stable, so original line order breaks ties.
      val w = Window.partitionBy("file")
        .orderBy(asc("domain"), asc("url"), asc("line_ord"))
      badFiltered
        .withColumn("line_ord", row_number().over(w).cast(LongType))
        .select("domain", "url", "warc", "offset", "length", "status", "mime",
                "file", "file_ord", "line_ord")
    }
  }
}
