package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization — the canonical-composition pass a
  * web corpus needs before any hash-based dedup or token matching
  * (crawled HTML mixes precomposed and combining-mark encodings of the
  * SAME text; their md5/minhash/shingle fingerprints differ until
  * normalized). Spark ships no normalizer, so this is a one-call
  * codegen'd expression over java.text.Normalizer; DuckDB's built-in
  * `nfc_normalize` is the oracle twin.
  */
object NormalizeExpressions {

  /** Static entry point for generated code. Fast path: Normalizer
    * .isNormalized is a cheap scan that avoids allocating for the
    * (overwhelmingly common) already-NFC input.
    */
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_nfc needs a string input, got ${child.dataType}")
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_nfc"

    override def nullSafeEval(t: Any): Any =
      nfc(t.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, t =>
        s"graft.expressions.NormalizeExpressions.nfc($t)")

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Accent stripping: NFD decomposition, then every combining mark
    * (general category M) removed — 'café'→'cafe', 'Åño'→'Ano'.
    * The other half of hash-key canonicalization: queries and crawled
    * text disagree on diacritics even after NFC. Characters that are
    * NOT canonical base+mark compositions (ø, ß, đ) pass through —
    * matching DuckDB's utf8proc-based `strip_accents`, the oracle
    * twin. Fast path: pure-ASCII input (the overwhelming web case)
    * returns unchanged without allocating.
    */
  def stripAccents(text: UTF8String): UTF8String = {
    val s = text.toString
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { ascii = s.charAt(i) < 128; i += 1 }
    if (ascii) text
    else {
      val d = java.text.Normalizer.normalize(
        s, java.text.Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(d.length)
      var j = 0
      while (j < d.length) {
        val cp = d.codePointAt(j)
        val t = Character.getType(cp)
        if (t != Character.NON_SPACING_MARK &&
            t != Character.COMBINING_SPACING_MARK &&
            t != Character.ENCLOSING_MARK)
          sb.appendCodePoint(cp)
        j += Character.charCount(cp)
      }
      UTF8String.fromString(sb.toString)
    }
  }

  case class StripAccents(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_strip_accents needs a string input, got ${child.dataType}")
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_strip_accents"

    override def nullSafeEval(t: Any): Any =
      stripAccents(t.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, t =>
        s"graft.expressions.NormalizeExpressions.stripAccents($t)")

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Idempotent registration (SQL name `graft_nfc`). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc", exprs => NfcNormalize(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_strip_accents", exprs => StripAccents(exprs.head), "built-in")
  }

  /** Column form; caller must have registered on the session. */
  def nfcCol(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_nfc", c)

  def stripAccentsCol(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_strip_accents", c)
}
