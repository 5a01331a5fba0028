package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, TernaryExpression}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Literal FIRST-occurrence string replace — Polars
  * `str.replace(..., literal=true)` semantics (reference
  * `src/util.rs:292-429` uses it ~20× in the ticker/company scrub
  * chains; Spark's `regexp_replace` replaces ALL matches).
  *
  * A native Catalyst `Expression` with codegen: each node references
  * its input child exactly once, so a 20-step fold stays a linear
  * 20-node tree (the round-1 `locate`+`overlay`+`when` formulation
  * referenced the input 4× per step → ~4^20-node tree → OOM at plan
  * time). Stays inside WholeStageCodegen.
  */
case class ReplaceFirst(str: Expression, search: Expression, replace: Expression)
    extends TernaryExpression {

  override def first: Expression = str
  override def second: Expression = search
  override def third: Expression = replace

  override def dataType: DataType = StringType
  override def prettyName: String = "replace_first"

  // Exposed as a SQL function (GraftExtensions): reject non-string
  // inputs at analysis time instead of a ClassCastException on the
  // executor. (ExpectsInputTypes is off-limits — `AbstractDataType`
  // is private[sql].)
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string, string) arguments, got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))

  override def nullSafeEval(s: Any, p: Any, r: Any): Any =
    ReplaceFirst.replaceFirst(
      s.asInstanceOf[UTF8String],
      p.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, p, r) =>
      s"graft.functions.ReplaceFirst.replaceFirst($s, $p, $r)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(str = newFirst, search = newSecond, replace = newThird)
}

object ReplaceFirst {
  /** Runtime kernel, called from both interpreted eval and generated
    * code. */
  def replaceFirst(s: UTF8String, search: UTF8String,
      replace: UTF8String): UTF8String = {
    if (search.numBytes() == 0) return s
    val str = s.toString
    val pat = search.toString
    val i = str.indexOf(pat)
    if (i < 0) s
    else UTF8String.fromString(
      str.substring(0, i) + replace.toString + str.substring(i + pat.length))
  }

  /** Column-level API: `ReplaceFirst(col, "PAT", "REPL")`. */
  def apply(c: Column, pat: String, repl: String): Column =
    Shims.column(ReplaceFirst(
      Shims.expression(c),
      Literal(UTF8String.fromString(pat), StringType),
      Literal(UTF8String.fromString(repl), StringType)))

  /** Column-argument variant (pattern/replacement per row). */
  def apply(c: Column, pat: Column, repl: Column): Column =
    Shims.column(ReplaceFirst(
      Shims.expression(c), Shims.expression(pat), Shims.expression(repl)))
}
