package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Coalesce, Expression, HllSketchEstimate, If, IsNull, Literal, Or, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateMode, Count, HllSketchAgg}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, BooleanType, ByteType, DataType, DateType, DecimalType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType, TimestampNTZType, TimestampType}

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
  * Scope under the base flag alone is deliberately conservative —
  * rewritten only when:
  *  - the aggregate is exactly `Count` over ONE child expression;
  *  - the child's type is one `HllSketchAgg` accepts (int, long,
  *    string, binary) — anything else stays exact;
  *  - the session opted in.
  * Multi-child `count(DISTINCT a, b, …)` additionally rewrites when
  * [[MultiColFlag]] is ALSO set (its hash-composed key is a weaker
  * guarantee class — see that flag's doc). A FILTER clause rides
  * through unchanged (AggregateExpression carries it orthogonally).
  * The estimate is wrapped in `coalesce(·, 0)` so a zero-row global
  * aggregate keeps `count`'s non-null 0, not a null sketch. The
  * rewrite happens INSIDE the analyzer-made Alias, so downstream
  * references to the column (HAVING, ORDER BY) keep resolving to
  * the same attribute.
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

  /** Additional opt-in for MULTI-column `count(DISTINCT a, b, …)`,
    * default off and only consulted when [[Flag]] is already on
    * (setting this alone does nothing): the multi-column form is
    * rewritten through a null-discriminating 64-bit hash of the
    * tuple (`xxhash64(a, b, …)` guarded so any-null rows stay
    * excluded, matching Count's multi-child semantics), so its error
    * is the HLL RSE PLUS a hash-collision undercount of ≈ n²/2⁶⁵
    * expected collisions — negligible against 1.6% RSE below ~10⁸
    * distinct tuples, but a different guarantee class than the
    * pure-sketch single-column rewrite, hence the separate dial. It
    * is also the bigger win: multi-column distincts are what force
    * the Expand multiplication in the exact plan.
    */
  val MultiColFlag = "spark.graft.rewrite.approxDistinct.multiColumn"

  private val supported: Set[DataType] =
    Set(IntegerType, LongType, StringType, BinaryType)

  /** The rule runs on EVERY plan in the session (registration is
    * unconditional), so malformed conf values must surface as a
    * config error naming the conf — not an opaque `.toBoolean`
    * throw that fails unrelated queries. Truthy spellings 1/0 are
    * accepted; lgK is bounds-checked here (datasketches' 4..21)
    * instead of failing at execution time.
    */
  private def boolConf(name: String): Boolean =
    conf.getConfString(name, "false").trim.toLowerCase match {
      case "true" | "1" => true
      case "false" | "0" | "" => false
      case other => throw new IllegalArgumentException(
        s"$name must be true/false/1/0, got '$other'")
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

  /** xxhash64 composes these atomic types deterministically. */
  private def hashable(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
        DoubleType | StringType | BinaryType | BooleanType | DateType |
        TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!boolConf(Flag)) return plan
    val lgK = lgKConf
    val multi = boolConf(MultiColFlag)
    def sketch(key: Expression, mode: AggregateMode,
        filter: Option[Expression]) =
      Coalesce(Seq(
        HllSketchEstimate(AggregateExpression(
          new HllSketchAgg(key, Literal(lgK)), mode,
          isDistinct = false, filter)),
        Literal(0L)))
    plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case AggregateExpression(Count(Seq(child)), mode, true, filter, _)
              if supported.contains(child.dataType) =>
            sketch(child, mode, filter)
          case AggregateExpression(Count(children), mode, true, filter, _)
              if multi && children.size > 1 &&
                children.forall(c => hashable(c.dataType)) =>
            // Count's multi-child form excludes rows where ANY child
            // is null — the hash key must reproduce that, so any-null
            // rows map to a null key the sketch aggregate skips
            val anyNull: Expression = children.map(IsNull).reduce(Or)
            sketch(If(anyNull, Literal(null, LongType),
              new XxHash64(children)), mode, filter)
        }
    }
  }
}
