package graft.plans

import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Expression, FunctionTableSubqueryArgumentExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType

/** SQL surface for the native as-of join — the TVF builder behind
  * `GraftExtensions`' `asof_join` registration, completing the
  * operator family's registration story (the scalar kernels
  * `replace_first`/`dot_product`/`unicode_normalize`/
  * `repetition_stats` set the precedent; a JOIN needs the
  * table-function registry instead of the expression one):
  *
  * {{{
  *   SELECT * FROM asof_join(TABLE(trades), TABLE(quotes), 'sym', 'ts')
  *   SELECT * FROM asof_join('trades', 'quotes', 'sym', 'ts',
  *                           'forward', 5000000)
  * }}}
  *
  * Both sides accept either a standard SQL table argument
  * (`TABLE(name)` / `TABLE(SELECT ...)` — the parser delivers the
  * subplan as a [[FunctionTableSubqueryArgumentExpression]], which
  * this builder unwraps into [[AsOfJoinPlan]]'s children before
  * analysis continues, so the argument plans resolve as ordinary
  * children and none of the UDTF-only subquery machinery is left in
  * the tree) or a view/table NAME as a string literal (resolved
  * through the session catalog like any `FROM name`). `direction`
  * is `'backward'` (default — latest right row at or before the
  * left time) or `'forward'`; `tolerance` bounds the match distance
  * in the time column's native units (µs for timestamps, days for
  * dates, the value itself for integrals — [[AsOfJoinPlan]]'s
  * contract). Tiebreak columns and the broadcast-right shape stay
  * DataFrame-API dials ([[graft.ops.AsOf]]) — the SQL surface
  * carries the common form, not every knob.
  *
  * Built by name at analysis time, the node goes through the same
  * [[AsOfJoinStrategy]] planning as the DataFrame path — one
  * operator, two front doors. AsOfSqlSpec pins SQL == DataFrame
  * result equality, both argument styles, both directions,
  * tolerance, and the loud errors.
  */
object AsOfSql {

  private def strArg(e: Expression, what: String): String = {
    require(e.foldable && e.dataType == StringType,
      s"asof_join: $what must be a string literal")
    val v = e.eval()
    require(v != null, s"asof_join: $what must not be NULL")
    v.toString
  }

  private def planOf(e: Expression, side: String): LogicalPlan =
    e match {
      case f: FunctionTableSubqueryArgumentExpression =>
        require(f.partitionByExpressions.isEmpty &&
            f.orderByExpressions.isEmpty && !f.withSinglePartition,
          s"asof_join: the $side TABLE argument does not take " +
            "PARTITION BY / ORDER BY / WITH SINGLE PARTITION — the " +
            "operator clusters by its own key and time columns")
        f.plan
      case other if other.foldable && other.dataType == StringType =>
        UnresolvedRelation(
          strArg(other, s"$side relation name").split('.').toIndexedSeq)
      case other =>
        throw new IllegalArgumentException(
          s"asof_join: $side argument must be TABLE(...) or a " +
            s"view/table name string literal, got ${other.sql}")
    }

  def build(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 4 && args.length <= 6,
      "asof_join(TABLE(left), TABLE(right), key, time[, direction[, " +
        "tolerance]]) takes 4 to 6 arguments")
    val left = planOf(args(0), "left")
    val right = planOf(args(1), "right")
    val key = strArg(args(2), "key column")
    val time = strArg(args(3), "time column")
    val forward =
      if (args.length < 5) false
      else strArg(args(4), "direction") match {
        case "backward" => false
        case "forward" => true
        case other => throw new IllegalArgumentException(
          s"asof_join: direction must be 'backward' or 'forward', " +
            s"got '$other'")
      }
    val tolerance =
      if (args.length < 6) None
      else {
        val e = args(5)
        require(e.foldable &&
            (e.dataType == org.apache.spark.sql.types.LongType ||
              e.dataType == org.apache.spark.sql.types.IntegerType),
          "asof_join: tolerance must be an integer literal")
        Some(e.eval().toString.toLong)
      }
    AsOfJoinPlan(left, right, key, time, tiebreakCols = Nil,
      forward = forward, tolerance = tolerance)
  }
}
