package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MIME normalization per scripts/filter_index.py:94–110 (mime_filter):
  *   1. strip `\`, `/`, `"` characters off both ends (mime1p)
  *   2. cut everything from the first `,` or `;` (mime2p — parameters /
  *      multiple types)
  *   3. `\` → `/` (`text\html` → `text/html`)
  *   4. if the result doesn't look like `type/subtype`, fall back to
  *      extension-based guessing (Python mimetypes.guess_type; here a
  *      fixed, documented subset of its table)
  *   5. keep only rows whose mime is in the allow-list.
  */
object Mimes {

  /** Subset of Python's mimetypes table used by the guess_type fallback.
    * Deterministic and identical on the Scala and Column paths.
    */
  val ExtToMime: Map[String, String] = Map(
    "html" -> "text/html", "htm" -> "text/html", "txt" -> "text/plain",
    "xml"  -> "text/xml", "json" -> "application/json",
    "pdf"  -> "application/pdf", "csv" -> "text/csv",
    "jpg"  -> "image/jpeg", "jpeg" -> "image/jpeg", "png" -> "image/png",
    "gif"  -> "image/gif", "mp3" -> "audio/mpeg", "mp4" -> "video/mp4"
  )

  /** Default allow-list (shape of the reference's data/allowed_mimes.txt;
    * content is ours — the reference file is a hand-grown site-specific
    * list).
    */
  val DefaultAllowed: Set[String] = Set(
    "text/html", "text/plain", "application/xhtml+xml", "application/xml",
    "application/atom+xml", "application/rss+xml", "application/pdf",
    "text/xml"
  )

  private val Valid = "^(?:[-\\w]+|[*])/(?:[-+.\\w]+|[*])$".r

  /** Pure normalization (reference-interpreter path). Returns null when
    * the fallback fails, mirroring guess_type's (None, None).
    */
  def normalize(mime: String): String = {
    var m = mime.replaceAll("^[\\\\/\"]+", "").replaceAll("[\\\\/\"]+$", "")
    m = m.replaceAll("[,;].*$", "")
    m = m.replace('\\', '/')
    if (Valid.pattern.matcher(m).matches()) m
    else {
      val dot = m.lastIndexOf('.')
      if (dot >= 0 && dot < m.length - 1)
        ExtToMime.getOrElse(m.substring(dot + 1).toLowerCase, null)
      else null
    }
  }

  /** Column form — pure `functions._` chain, stays in codegen. */
  def normalizeCol(mime: Column): Column = {
    val stripped = regexp_replace(
      regexp_replace(mime, "^[\\\\/\"]+", ""), "[\\\\/\"]+$", "")
    val cut    = regexp_replace(stripped, "[,;].*$", "")
    val fixed  = regexp_replace(cut, "\\\\", "/")
    val extMap = map(
      ExtToMime.toSeq.sortBy(_._1)
        .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val ext = when(fixed.contains("."),
      lower(substring_index(fixed, ".", -1))).otherwise(lit(null))
    when(fixed.rlike("^(?:[-\\w]+|[*])/(?:[-+.\\w]+|[*])$"), fixed)
      .otherwise(element_at(extMap, ext))
  }
}
