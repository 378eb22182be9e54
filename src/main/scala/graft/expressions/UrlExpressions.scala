package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native RFC 3986-style URL resolution for outlink extraction.
  *
  * The same semantics exist as a pure-column CASE in
  * [[graft.operators.Links]]'s DuckDB oracle — but as a Column tree the
  * bounded dot-segment fold NESTS the whole resolution CASE inside each
  * regexp_replace level, blowing the generated method past the JIT
  * limit and dropping the stage to interpreted mode (measured 24 s for
  * 900k rows at sf0.1). A compiled scalar with static precompiled
  * Patterns is the right shape for per-row scalar work: one method
  * call inside whole-stage codegen.
  *
  * Contract (identical to the SQL oracle, byte for byte):
  *   - absolute http(s) kept as-is; any other scheme -> null
  *   - protocol-relative / root-relative joined to the base parts
  *   - empty and fragment-only -> null
  *   - directory-relative: leading "./" runs stripped, joined to the
  *     base directory ('/' when the base has no path)
  *   - fragments stripped from survivors
  *   - bounded dot-segment collapse: `MaxDotSegments` passes of the
  *     seg-slash-dot-dot pattern (see `DotSeg`; dot-leading segments
  *     never collapse — under-resolution, never corruption)
  */
object UrlExpressions {

  val MaxDotSegments = 4

  private val AbsHttp = Pattern.compile("^(?i)(https?)://.*")
  private val AnyScheme = Pattern.compile("^[a-zA-Z][a-zA-Z0-9+.-]*:.*")
  private val DotSeg = Pattern.compile("/[^/.][^/]*/\\.\\./")
  private val LeadDot = Pattern.compile("^(\\./)+")

  /** Static entry point for generated code; null means "drop". */
  def resolve(baseU: UTF8String, hrefU: UTF8String): UTF8String = {
    val base = baseU.toString
    val href = hrefU.toString
    val joined: String =
      if (AbsHttp.matcher(href).matches()) href
      else if (AnyScheme.matcher(href).matches()) return null
      else {
        // base parts: scheme, host, path (query/fragment excluded)
        val si = base.indexOf("://")
        if (si < 0) return null
        val scheme = base.substring(0, si)
        val hostStart = si + 3
        var he = hostStart
        while (he < base.length && base.charAt(he) != '/' &&
               base.charAt(he) != '?' && base.charAt(he) != '#') he += 1
        val host = base.substring(hostStart, he)
        if (href.startsWith("//")) scheme + ":" + href
        else if (href.startsWith("/")) scheme + "://" + host + href
        else if (href.isEmpty || href.startsWith("#")) return null
        else {
          var pe = he
          while (pe < base.length && base.charAt(pe) != '?' &&
                 base.charAt(pe) != '#') pe += 1
          val path = base.substring(he, pe)
          val cut = path.lastIndexOf('/')
          val baseDir = if (path.isEmpty) "/"
            else path.substring(0, cut + 1) // path always starts with '/'
          scheme + "://" + host + baseDir +
            LeadDot.matcher(href).replaceAll("")
        }
      }
    val hi = joined.indexOf('#')
    var out = if (hi >= 0) joined.substring(0, hi) else joined
    var i = 0
    while (i < MaxDotSegments) {
      out = DotSeg.matcher(out).replaceAll("/")
      i += 1
    }
    UTF8String.fromString(out)
  }

  case class ResolveUrl(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == StringType && right.dataType == StringType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_resolve_url needs (string, string), got " +
          s"(${left.dataType}, ${right.dataType})")
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_resolve_url"

    override def nullSafeEval(b: Any, h: Any): Any =
      resolve(b.asInstanceOf[UTF8String], h.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (b, h) => s"""
        ${ev.value} = graft.expressions.UrlExpressions.resolve($b, $h);
        ${ev.isNull} = ${ev.value} == null;
      """)

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Idempotent registration (SQL name `graft_resolve_url`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_resolve_url",
      exprs => ResolveUrl(exprs.head, exprs(1)), "built-in")

  /** Column form; caller must have registered on the session. */
  def resolveUrlCol(base: Column, href: Column): Column =
    org.apache.spark.sql.functions
      .call_function("graft_resolve_url", base, href)
}
