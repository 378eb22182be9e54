package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two array<double> columns (builder brief:
  * "`functions.aggregate`/`zip_with` for the dot product, or a custom
  * `Expression`" — this is the upgrade). Versus the zip_with+aggregate
  * chain this allocates NO intermediate array per row-pair and stays a
  * single static call inside whole-stage codegen; the summation order
  * is the same sequential left-to-right fold, so results (and the
  * DuckDB oracles built on them) are bit-identical.
  */
object VectorExpressions {

  // The bit-identical-to-zip_with claim holds for equal-length, null-free
  // arrays; the guards below make any other input a loud error instead of
  // a silent truncate-to-min / null-reads-as-0 divergence.
  private def checkPair(a: ArrayData, b: ArrayData, name: String): Int = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"$name: vector length mismatch (${a.numElements()} vs " +
        s"${b.numElements()}) — embeddings must share a dimension")
    n
  }

  /** Static entry point for generated code. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = checkPair(a, b, "graft_dot")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_dot: null element at index $i — vectors must be null-free")
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Static entry point for generated code. */
  def sqDist(a: ArrayData, b: ArrayData): Double = {
    val n = checkPair(a, b, "graft_sqdist")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_sqdist: null element at index $i — vectors must be null-free")
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = {
      def ok(t: DataType) = t match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_dot needs two array<double> inputs, got " +
          s"${left.dataType} / ${right.dataType}")
    }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    override def nullSafeEval(a: Any, b: Any): Any =
      dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.expressions.VectorExpressions.dot($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Squared L2 distance — same contract as DotProduct (sequential fold,
    * bit-identical to the zip_with form, no intermediate array).
    */
  case class SqDist(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult = {
      def ok(t: DataType) = t match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_sqdist needs two array<double> inputs, got " +
          s"${left.dataType} / ${right.dataType}")
    }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_sqdist"

    override def nullSafeEval(a: Any, b: Any): Any =
      sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.expressions.VectorExpressions.sqDist($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Idempotent registration (SQL names `graft_dot`, `graft_sqdist`). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      exprs => DotProduct(exprs.head, exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sqdist",
      exprs => SqDist(exprs.head, exprs(1)),
      "built-in")
  }

  /** Column forms; caller must have registered on the session. */
  def dotCol(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_dot", a, b)

  def sqDistCol(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_sqdist", a, b)
}
