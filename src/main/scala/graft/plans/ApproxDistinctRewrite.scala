package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Coalesce, HllSketchEstimate, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HllSketchAgg}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}

/** Opt-in approximate-query rewrite: `count(DISTINCT x)` → an HLL
  * sketch aggregate + estimate, as a Catalyst optimizer rule
  * (registered by [[graft.GraftExtensions]], gated off
  * [[ApproxDistinctRewrite.Flag]], default OFF).
  *
  * Why this is a 100 TB lever: exact distinct counts are planned as
  * either a two-phase re-shuffle on the distinct column or — with
  * several distinct aggregates in one query — an Expand that
  * multiplies every input row per distinct column before a
  * corpus-sized exchange. The sketch form is one ordinary aggregation
  * pass with fixed-size (2^lgK registers) partial state that
  * map-side-combines and unions associatively, the same discipline
  * [[graft.ops.StatsStore]] builds its monitoring on — at the
  * documented ~1.04/√2^lgK relative standard error (~1.6% at the
  * default lgK = 12, dial [[LgKConf]]).
  *
  * Scope is deliberately conservative — rewritten only when:
  *  - the aggregate is exactly `Count` over ONE child expression
  *    (multi-child `count(DISTINCT a, b)` has no sketch twin here);
  *  - the child's type is one `HllSketchAgg` accepts (int, long,
  *    string, binary) — anything else stays exact;
  *  - the session opted in.
  * A FILTER clause rides through unchanged (AggregateExpression
  * carries it orthogonally). The estimate is wrapped in
  * `coalesce(·, 0)` so a zero-row global aggregate keeps
  * `count`'s non-null 0, not a null sketch. The rewrite happens
  * INSIDE the analyzer-made Alias, so downstream references to the
  * column (HAVING, ORDER BY) keep resolving to the same attribute.
  *
  * Exactness note a user can lean on: the datasketches HLL stays in
  * exact (list/set) mode for small cardinalities, so low-cardinality
  * groups return exact counts under the rewrite too — the spec pins
  * both that regime and the estimate-mode tolerance.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  /** Session flag; default false (exact semantics untouched). */
  val Flag = "spark.graft.rewrite.approxDistinct"

  /** HLL precision for rewritten aggregates (default 12 ≈ 1.6% RSE). */
  val LgKConf = "spark.graft.rewrite.approxDistinct.lgK"

  private val supported: Set[DataType] =
    Set(IntegerType, LongType, StringType, BinaryType)

  /** The rule runs on EVERY plan in the session (registration is
    * unconditional), so malformed conf values must surface as a
    * config error naming the conf — not an opaque `.toBoolean`
    * throw that fails unrelated queries. Truthy spellings 1/0 are
    * accepted; lgK is bounds-checked here (datasketches' 4..21)
    * instead of failing at execution time.
    */
  private def flagOn: Boolean =
    conf.getConfString(Flag, "false").trim.toLowerCase match {
      case "true" | "1" => true
      case "false" | "0" | "" => false
      case other => throw new IllegalArgumentException(
        s"$Flag must be true/false/1/0, got '$other'")
    }

  private def lgKConf: Int = {
    val raw = conf.getConfString(LgKConf, "12").trim
    val v =
      try raw.toInt
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$LgKConf must be an integer in [4, 21], got '$raw'")
      }
    require(v >= 4 && v <= 21,
      s"$LgKConf must be in [4, 21] (datasketches HLL bounds), got $v")
    v
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!flagOn) return plan
    val lgK = lgKConf
    plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case AggregateExpression(Count(Seq(child)), mode, true, filter, _)
              if supported.contains(child.dataType) =>
            Coalesce(Seq(
              HllSketchEstimate(AggregateExpression(
                new HllSketchAgg(child, Literal(lgK)), mode,
                isDistinct = false, filter)),
              Literal(0L)))
        }
    }
  }
}
