package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of two `array<double>` columns as a native codegen'd
  * expression: a primitive `while` loop over `ArrayData` — no boxing,
  * no per-element lambda interpretation (Catalyst higher-order
  * functions are CodegenFallback; the `zip_with`+`aggregate`
  * formulation allocated two boxed Doubles per element and showed GC-
  * sensitive 0.9–26 s swings on the similarity battery).
  *
  * Accumulates in INDEX ORDER, matching the left-assoc fold the DuckDB
  * oracle SQL spells out — results are bit-identical to both the HOF
  * formulation it replaces and the oracle.
  *
  * Array elements must be non-null (embedding vectors); a null ARRAY
  * propagates null. Lengths are not required to match — iteration
  * stops at the shorter (same as `zip_with` + null-skipping would not;
  * callers pass equal-dim vectors).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    val ok = children.forall(_.dataType match {
      case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckSuccess
    else TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>), got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProduct.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Runtime kernel (interpreted eval + generated code). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    Shims.column(DotProduct(Shims.expression(a), Shims.expression(b)))
}
