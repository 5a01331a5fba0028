package graft.ark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity-resolution rules (reference `src/util/format/ticker.rs`).
  *
  * Each step rewrites `ticker` and/or `company` where a match column
  * equals a literal. Steps apply *sequentially* (each sees the
  * previous step's output — the reference chains `.with_columns(...)`
  * calls, e.g. the four CASH_USD variants, `format/ticker.rs:244-272`),
  * while the assignments *within* one step all evaluate against that
  * step's input frame (one Polars `with_columns` vec — e.g. RKLB's two
  * expressions, `format/ticker.rs:294-316`).
  *
  * Data-driven table instead of 11 hand-written functions; value pairs
  * reproduced as-is, including the reference's `TSM`→`TMSC` spelling
  * (`format/ticker.rs:281-283`) — capability parity, the reference is
  * the oracle.
  */
object SecurityRules {

  /** targetCol := newVal where matchCol == matchVal, else unchanged. */
  final case class Assign(matchCol: String, matchVal: String,
      targetCol: String, newVal: String)

  /** One sequential step = one projection; assigns see the step input. */
  final case class Step(assigns: Seq[Assign])

  /** `get_expr("company", cur, new)` rewrites BOTH ticker and company
    * (ref `format/ticker.rs:48-72`).
    */
  private def both(cur: String, nw: String) = Step(Seq(
    Assign("company", cur, "ticker", nw),
    Assign("company", cur, "company", nw)))
  private def tickerOnly(cur: String, nw: String) =
    Step(Seq(Assign("company", cur, "ticker", nw)))
  private def companyOnly(cur: String, nw: String) =
    Step(Seq(Assign("company", cur, "company", nw)))

  /** In `format::Ticker::iter()` order (ref `format/ticker.rs:10-22`). */
  val steps: Seq[Step] = Seq(
    // ARKW (ref format/ticker.rs:74-96) — two sequential both-assigns
    both("ARK BITCOIN ETF HOLDCO (ARKW)", "ARKB"),
    both("ARK BITCOIN ETF HOLDCO (ARKF)", "ARKB"),
    tickerOnly("CIRCLE INTERNET GROUP", "CRLC"), // CRLC (98-116)
    tickerOnly("COREWEAVE", "CRWV"),             // CRWV (118-136)
    companyOnly("AFTKINGS", "DRAFTKINGS"),       // DKNG (138-156)
    tickerOnly("ETORO GROUP", "ETOR"),           // ETOR (158-176)
    tickerOnly("MARKFORGEDG", "MKFG"),           // MKFG (178-196)
    tickerOnly("INTUITIVE MACHINES", "LUNR"),    // LUNR (198-216)
    // XYZ (218-242) — two sequential single-assign steps
    tickerOnly("BLOCK", "XYZ"),
    tickerOnly("Block", "XYZ"),
    // CASH_USD (244-272) — four sequential both-assign steps
    both("Cash & Cash Equivalents", "CASH_USD"),
    both("CASH & CASH EQUIVALENTS", "CASH_USD"),
    both("GOLDMAN FS TRSY OBLIG INST 468", "CASH_USD"),
    both("Cash & Other", "CASH_USD"),
    companyOnly("TAIWANMICONDUCTORSP", "TMSC"),  // TSM (274-292)
    // RKLB (294-316) — ONE step, two assigns with different matches
    Step(Seq(
      Assign("company", "ROCKET LAB", "ticker", "RKLB"),
      Assign("company", "ROCKET LAB USA", "company", "ROCKET LAB"))))

  private def assignExpr(a: Assign): Column =
    when(col(a.matchCol) === lit(a.matchVal), lit(a.newVal))
      .otherwise(col(a.targetCol))

  /** Apply every rule step in order (ref `format/ticker.rs:25-30`).
    * Each reference rule is wrapped in `if let Ok(x) … { df = x }` —
    * a failing rewrite (missing column) leaves the frame unchanged; we
    * replicate per-step: a step applies iff every column it references
    * (match + target, across all its assigns) exists — so company-only
    * rules like DKNG/TSM still fire on a frame lacking `ticker`, while
    * a step touching a missing column is skipped whole, exactly like
    * the reference's failed `with_columns`. One `withColumns` per step
    * = one projection per step; Catalyst collapses the chain into a
    * single projection.
    */
  def apply(df: DataFrame): DataFrame = {
    val cols = df.columns.toSet
    steps.foldLeft(df) { (d, step) =>
      val needed = step.assigns.flatMap(a => Seq(a.matchCol, a.targetCol)).toSet
      if (!needed.subsetOf(cols)) d
      else d.withColumns(step.assigns.map(a => a.targetCol -> assignExpr(a)).toMap)
    }
  }
}
