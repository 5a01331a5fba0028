package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen'd Catalyst
  * expression — the canonicalization pass a multilingual corpus needs
  * BEFORE any of the text tier's byte/codepoint-based operators
  * (shingles, fingerprints, exact dedup hashes): the same visible
  * text arrives both composed (é) and decomposed (e +  ́) from real
  * crawls, and without canonical equivalence folding, exact dedup
  * treats them as distinct documents and n-gram fingerprints diverge.
  * Spark has no built-in; the JDK's `java.text.Normalizer` is the
  * public standard implementation, and DuckDB's `nfc_normalize`
  * oracles the NFC form (q153).
  *
  * The `form` is a plan-time config (not a child expression), so the
  * generated code references the enum constant directly and the hot
  * path is one static call per row inside WholeStageCodegen, with an
  * `isNormalized` fast path that returns the input buffer untouched —
  * most real text IS already NFC, so the common case allocates
  * nothing.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got " +
          child.dataType.simpleString)
    else if (!UnicodeNormalize.Forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be one of " +
          s"${UnicodeNormalize.Forms.mkString(", ")}, got '$form'")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val formEnum = java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(s: Any): Any =
    UnicodeNormalize.normalize(s.asInstanceOf[UTF8String], formEnum)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnicodeNormalize.normalize($c, " +
        s"java.text.Normalizer.Form.$form)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Runtime kernel, called from both interpreted eval and generated
    * code. Already-normalized input (the overwhelmingly common case)
    * returns the input buffer untouched.
    */
  def normalize(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }

  /** Column-level API: `UnicodeNormalize(col)` = NFC. */
  def apply(c: Column): Column = apply(c, "NFC")

  def apply(c: Column, form: String): Column =
    Shims.column(UnicodeNormalize(Shims.expression(c), form))
}
