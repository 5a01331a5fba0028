package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style n-gram repetition signals for ONE document, as a
  * native Catalyst expression: struct(n_chars, top2_chars,
  * dup3_chars) where `top2_chars` = count·len of the most frequent
  * word-2-gram (ties on count resolve to the longest tied gram) and
  * `dup3_chars` = Σ count·len over word-3-grams with count > 1. The
  * per-doc gram histogram is inherently an object-hash kernel, but
  * as an expression it runs INSIDE whole-stage codegen (one static
  * call per row, the ReplaceFirst/DotProduct pattern) instead of a
  * typed `mapPartitions` paying Dataset encoder ser/de per row and
  * splitting the stage at DeserializeToObject — this replaced the
  * last such kernel in the batch tier (TextOps.repetitionStats).
  *
  * All lengths count CODE POINTS, matching DuckDB's `length()` in
  * the q138 oracle — a supplementary-plane character (emoji, rare
  * CJK) counts 1 here and 1 there, where the previous kernel's
  * UTF-16 `String.length` counted 2 and silently diverged from the
  * oracle on every `*_chars` value.
  *
  * Null handling is the CALLER's: a null input returns a null
  * struct (standard null-intolerant semantics); callers that want
  * the old kernel's zero row for null text coalesce to "" first
  * (an empty text has one empty token — no 2-grams, no 3-grams —
  * so every field is 0).
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("top2_chars", LongType, nullable = false),
    StructField("dup3_chars", LongType, nullable = false)))

  override def prettyName: String = "repetition_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.simpleString)

  override def nullSafeEval(s: Any): Any =
    RepetitionStats.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RepetitionStats.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object RepetitionStats {

  private def codePoints(s: String): Long =
    s.codePointCount(0, s.length).toLong

  /** Runtime kernel, called from both interpreted eval and generated
    * code. One O(n) pass per k building the gram multiset — the
    * same arithmetic the previous typed kernel ran, exact integers
    * throughout so no float boundary ever decides a downstream flag.
    */
  def compute(s: UTF8String): InternalRow = {
    val text = s.toString
    val t = text.split(" ", -1)
    def grams(k: Int): java.util.HashMap[String, Long] = {
      val m = new java.util.HashMap[String, Long]
      var i = 0
      while (i <= t.length - k) {
        val sb = new java.lang.StringBuilder(t(i))
        var j = 1
        while (j < k) { sb.append(' ').append(t(i + j)); j += 1 }
        val g = sb.toString
        m.merge(g, 1L, (a, b) => a + b)
        i += 1
      }
      m
    }
    var top2 = 0L
    if (t.length >= 2) {
      val m = grams(2)
      var best = 0L; var bestLen = 0L
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue
        if (c > best) { best = c; bestLen = codePoints(e.getKey) }
        else if (c == best) {
          val l = codePoints(e.getKey)
          if (l > bestLen) bestLen = l
        }
      }
      top2 = best * bestLen
    }
    var dup3 = 0L
    if (t.length >= 3) {
      val it = grams(3).entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue > 1L) dup3 += e.getValue * codePoints(e.getKey)
      }
    }
    new GenericInternalRow(
      Array[Any](codePoints(text), top2, dup3))
  }

  /** Column-level API. */
  def apply(c: Column): Column =
    Shims.column(RepetitionStats(Shims.expression(c)))
}
