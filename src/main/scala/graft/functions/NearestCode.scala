package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{DataType, LongType}

/** Zero-shuffle quantizer assignments: the IVF cell argmax and the PQ
  * sub-code argmin as native codegen'd expressions over a LITERAL
  * model table (the centroid/codebook frames are broadcast-sized by
  * the store contract — [[graft.ops.Similarity.pqTrain]] already
  * driver-materializes the codebooks every Lloyd iteration).
  *
  * Why: the join+aggregate formulations ([[graft.ops.Similarity
  * .assignCosineCells]] / `assignEuclidKeyed`) complete their groups
  * map-side (each input row's k candidate rows never leave the task)
  * yet still pay a corpus-sized Exchange to FINISH the groupBy, plus a
  * second corpus Exchange to pivot or re-join the assignment onto the
  * row. A per-row fold computes the same argbest with ZERO exchanges —
  * the optimization guide's "remove shuffles outright" (§2.4) applied
  * to the encode pass, which at 100 TB is the difference between one
  * clean scan→write and three corpus shuffles.
  *
  * Bit-identical by construction, not by luck:
  *  - dot products run the SAME index-order kernel ([[DotProduct
  *    .dot]]);
  *  - the cell score is `round(dot/(nrm·cn), 6)` with Spark's own
  *    double-round semantics (`BigDecimal.valueOf(x).setScale(6,
  *    HALF_UP)`, NaN/Inf passed through);
  *  - comparisons use Spark SQL's double ordering (`-0.0 == 0.0`,
  *    NaN greater than everything, NaN == NaN) so a zero-norm vector
  *    ties all-NaN and falls to the id tie-break exactly as
  *    `max_by`/`min_by` order it;
  *  - ties break to the SMALLEST candidate id, matching
  *    `max_by(_, struct(cos, -cid))` / `min_by(_, struct(score, cid))`.
  *
  * NearestCodeSpec pins equality against the join+aggregate
  * formulations on fabricated tie/zero-vector corpora.
  */
private[graft] object NearestCode {
  /** Spark SQL's double ordering (SQLOrderingUtil.compareDoubles):
    * `x == y` first so -0.0 == 0.0, else java compare (NaN largest,
    * NaN == NaN). */
  def cmp(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  /** Spark's round(x, 6) for doubles: BigDecimal.valueOf + HALF_UP.
    * valueOf throws on NaN/Inf, which the join formulation never
    * feeds it either (Round's eval path receives the raw double and
    * would throw the same way) — pass them through so a zero-norm
    * vector reaches the NaN tie-break instead of crashing. */
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** argmax over cents of round6(dot(e,ce)/(nrm·cn)), ties to the
    * smallest cid; cents rows are (cid: long, _ce: array<double>,
    * _cn: double). Returns the winning cid. */
  def bestCell(e: ArrayData, cents: ArrayData): Long = {
    val nrm = math.sqrt(DotProduct.dot(e, e))
    var bestCid = 0L
    var bestCos = 0.0d
    var first = true
    var i = 0
    val n = cents.numElements()
    while (i < n) {
      val c = cents.getStruct(i, 3)
      val cid = c.getLong(0)
      val cos = round6(
        DotProduct.dot(e, c.getArray(1)) / (nrm * c.getDouble(2)))
      val d = if (first) 1 else cmp(cos, bestCos)
      if (d > 0 || (d == 0 && cid < bestCid)) {
        bestCid = cid; bestCos = cos; first = false
      }
      i += 1
    }
    bestCid
  }

  /** argmin over the `sj`-subspace codebook entries of
    * dot(ce,ce) − 2·dot(e,ce), ties to the smallest cid; codebook
    * rows are (_sj: int, cid: long, _ce: array<double>). */
  def bestCode(e: ArrayData, sj: Int, cb: ArrayData): Long = {
    var bestCid = 0L
    var bestScore = 0.0d
    var first = true
    var i = 0
    val n = cb.numElements()
    while (i < n) {
      val c = cb.getStruct(i, 3)
      if (c.getInt(0) == sj) {
        val ce = c.getArray(2)
        val cid = c.getLong(1)
        val score = DotProduct.dot(ce, ce) -
          2.0d * DotProduct.dot(e, ce)
        val d = if (first) -1 else cmp(score, bestScore)
        if (d < 0 || (d == 0 && cid < bestCid)) {
          bestCid = cid; bestScore = score; first = false
        }
        i += 1
      } else i += 1
    }
    bestCid
  }
}

/** `NearestCosineCell(vec, centsLiteral)` — see [[NearestCode]]. */
case class NearestCosineCell(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_cosine_cell"

  override def nullSafeEval(e: Any, cents: Any): Any =
    NearestCode.bestCell(e.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (e, c) => s"graft.functions.NearestCode.bestCell($e, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NearestCosineCell {
  def apply(vec: Column, cents: Column): Column =
    Shims.column(NearestCosineCell(
      Shims.expression(vec), Shims.expression(cents)))
}

/** `NearestPqCode(vecSlice, sj, codebookLiteral)` — see
  * [[NearestCode]]. */
case class NearestPqCode(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_pq_code"

  override def nullSafeEval(e: Any, sj: Any, cb: Any): Any =
    NearestCode.bestCode(e.asInstanceOf[ArrayData],
      sj.asInstanceOf[Int], cb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, sj, cb) =>
      s"graft.functions.NearestCode.bestCode($e, $sj, $cb)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object NearestPqCode {
  def apply(vecSlice: Column, sj: Column, cb: Column): Column =
    Shims.column(NearestPqCode(Shims.expression(vecSlice),
      Shims.expression(sj), Shims.expression(cb)))
}
