package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Mechanical facts of an EXECUTED (AQE-final) physical plan — the
  * shared counting kernel behind the PLANS.md artifact
  * ([[PlanAudit]]) and the in-suite regression net (PlanBudgetSpec):
  * the scale claims the scaladocs make ("one shuffle", "dims
  * broadcast", "kernel runs once") reduce to these counts, so a
  * future edit that quietly adds an exchange fails `sbt test`
  * instead of waiting for a bench round to notice.
  *
  * Counts are DISTINCT CANONICALIZED nodes from a tree walk (AQE
  * query stages unwrapped, `ReusedExchangeExec` followed into its
  * target), not plan-string regex hits. The distinction matters for
  * determinism: AQE's exchange-reuse is a stage-materialization
  * race, and when it loses, an identical exchange materializes twice
  * and its whole subtree re-prints — a regex count then reports +2
  * shuffles/+2 scans for a plan whose SHAPE is unchanged (the round-9
  * "bistable" q64/q119/q53 violations were exactly this, flipping
  * between cold and warm JVMs). Canonical dedup counts the logical
  * exchange/scan SITES, which are a pure function of the plan — a
  * genuinely new shuffle or kernel re-run with different
  * pruning/filters still counts (different canonical form); only
  * byte-identical duplicates that Spark itself would reuse collapse.
  */
object PlanFacts {

  final case class Facts(shuffles: Int, broadcasts: Int, windows: Int,
      codegenSpans: Int, scans: Int, reusedExchanges: Int) {
    def row: String =
      s"$shuffles\t$broadcasts\t$windows\t$codegenSpans\t$scans\t$reusedExchanges"
  }

  /** Every node reachable from `p`, unwrapping adaptive plans and
    * query stages, following reused exchanges into their targets,
    * and descending into subquery plans.
    */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case s: QueryStageExec => s +: nodes(s.plan)
      case r: ReusedExchangeExec => r +: nodes(r.child)
      case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        // a persisted frame's build plan (the fixpoint shuffles of
        // clusters(), say) is part of the query's data-movement shape
        i +: nodes(i.relation.cachedPlan)
      case o => o +: o.children.flatMap(nodes)
    }
    here ++ p.subqueries.flatMap(nodes)
  }

  /** Execute `df` and tabulate its final adaptive plan. */
  def of(df: DataFrame): Facts = {
    df.collect()
    val all = nodes(df.queryExecution.executedPlan)
    def distinct(sel: PartialFunction[SparkPlan, SparkPlan]): Int =
      all.collect(sel).map(_.canonicalized).distinct.size
    Facts(
      // hash exchanges only, like the historical "Exchange
      // hashpartitioning" grep: range exchanges are presentation
      // sorts (orderBy on a result frame), not data-movement shape
      shuffles = distinct {
        case e: ShuffleExchangeExec
            if e.outputPartitioning
              .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
      },
      broadcasts = distinct { case e: BroadcastExchangeExec => e },
      windows = distinct { case w: WindowExec => w },
      codegenSpans = distinct { case w: WholeStageCodegenExec => w },
      scans = distinct { case s: FileSourceScanExec => s },
      reusedExchanges = all.count(_.isInstanceOf[ReusedExchangeExec]))
  }

  /** Queries that execute a streaming state machine — no static
    * batch plan to tabulate (their evidence is the oracle match).
    */
  val streaming: Set[String] = Set("q38_sessionize", "q40_stream_rollup",
    "q41_stream_dedupe", "q58_stream_enrich", "q66_stream_interval_join",
    "q68_session_window", "q69_stream_left_join",
    "q96_stream_merge_history", "q107_stream_complete_rollup",
    "q131_stream_stats_update", "q147_stream_asof_enrich",
    "q155_stream_ann_serve", "q164_stream_text_index",
    "q170_stream_corpus", "q190_stream_gated")

  /** Queries whose RETURNED frame is driver-composed (LocalTableScan)
    * — the distributed work ran in upstream eager jobs, so the final
    * plan string carries no signal. q130 runs its rollup twice (flag
    * off/on) eagerly so the rewrite flag is still set when each plan
    * optimizes; its plan evidence lives in
    * ApproxDistinctRewriteSpec's optimized/physical-plan assertions.
    */
  val composed: Set[String] = Set("q85_heavy_hitters_cms",
    "q130_approx_distinct_rewrite")
}
