package graft

import org.apache.spark.sql.DataFrame

/** Mechanical facts of an EXECUTED (AQE-final) physical plan — the
  * shared counting kernel behind the PLANS.md artifact
  * ([[PlanAudit]]) and the in-suite regression net (PlanBudgetSpec):
  * the scale claims the scaladocs make ("one shuffle", "dims
  * broadcast", "kernel runs once") reduce to these counts, so a
  * future edit that quietly adds an exchange fails `sbt test`
  * instead of waiting for a bench round to notice.
  */
object PlanFacts {

  final case class Facts(shuffles: Int, broadcasts: Int, windows: Int,
      codegenSpans: Int, scans: Int, reusedExchanges: Int) {
    def row: String =
      s"$shuffles\t$broadcasts\t$windows\t$codegenSpans\t$scans\t$reusedExchanges"
  }

  /** Execute `df` and tabulate its final adaptive plan. */
  def of(df: DataFrame): Facts = {
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    def n(pat: String) = pat.r.findAllIn(p).length
    Facts(
      shuffles = n("Exchange hashpartitioning"),
      broadcasts = n("BroadcastExchange"),
      windows = n("\\bWindow\\b"),
      codegenSpans = "\\*\\((\\d+)\\)".r.findAllMatchIn(p)
        .map(_.group(1)).toSet.size,
      scans = n("Scan parquet"),
      reusedExchanges = n("ReusedExchange"))
  }

  /** Queries that execute a streaming state machine — no static
    * batch plan to tabulate (their evidence is the oracle match).
    */
  val streaming: Set[String] = Set("q38_sessionize", "q40_stream_rollup",
    "q41_stream_dedupe", "q58_stream_enrich", "q66_stream_interval_join",
    "q68_session_window", "q69_stream_left_join",
    "q96_stream_merge_history", "q107_stream_complete_rollup")

  /** Queries whose RETURNED frame is driver-composed (LocalTableScan)
    * — the distributed work ran in upstream eager jobs, so the final
    * plan string carries no signal.
    */
  val composed: Set[String] = Set("q85_heavy_hitters_cms")
}
