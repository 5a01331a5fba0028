package graft

import graft.functions.{DotProduct, RepetitionStats, ReplaceFirst, UnicodeNormalize}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension wiring: registers the engine's custom Catalyst
  * expressions as SQL functions, so `spark.sql` users get them too
  * (`SELECT replace_first(col, 'PAT', 'REPL')`). Install via
  * `spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder.withExtensions` (GraftSession does the
  * latter).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // opt-in AQP: count(DISTINCT x) → HLL sketch estimate, flag-gated
    // inside the rule itself so registration is unconditional
    ext.injectOptimizerRule(_ => graft.plans.ApproxDistinctRewrite)
    // whole-operator extension: plans AsOfJoinPlan (ops.AsOf
    // .asofJoinNative) into the merge-walk AsOfJoinExec; a no-op on
    // every other plan
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // the operator's SQL front door: a table-valued function over
    // the same logical node (graft.plans.AsOfSql) — TABLE(...) args
    // or view-name string literals
    ext.injectTableFunction((
      new FunctionIdentifier("asof_join"),
      new ExpressionInfo(graft.plans.AsOfSql.getClass.getName,
        "asof_join"),
      (args: Seq[Expression]) => graft.plans.AsOfSql.build(args)))
    // the persisted text index's SQL front door: text_search(dir,
    // idCol, terms) returns the stored-index BM25 frame; ranking
    // composes in SQL (ORDER BY score DESC LIMIT k)
    ext.injectTableFunction((
      new FunctionIdentifier("text_search"),
      new ExpressionInfo(graft.plans.TextSearchSql.getClass.getName,
        "text_search"),
      (args: Seq[Expression]) => graft.plans.TextSearchSql.build(args)))
    // its boolean/positional siblings: quorum-or-AND matching and
    // exact-phrase / ordered-proximity retrieval
    ext.injectTableFunction((
      new FunctionIdentifier("text_match"),
      new ExpressionInfo(graft.plans.TextSearchSql.getClass.getName,
        "text_match"),
      (args: Seq[Expression]) =>
        graft.plans.TextSearchSql.buildMatch(args)))
    ext.injectTableFunction((
      new FunctionIdentifier("text_phrase"),
      new ExpressionInfo(graft.plans.TextSearchSql.getClass.getName,
        "text_phrase"),
      (args: Seq[Expression]) =>
        graft.plans.TextSearchSql.buildPhrase(args)))
    // the persisted ANN index's SQL front door: the dense serving
    // twin of text_search (queries arrive as a named view — the
    // batch is itself a relation), plus the pre-filtered form
    ext.injectTableFunction((
      new FunctionIdentifier("ann_search"),
      new ExpressionInfo(graft.plans.AnnSearchSql.getClass.getName,
        "ann_search"),
      (args: Seq[Expression]) => graft.plans.AnnSearchSql.build(args)))
    ext.injectTableFunction((
      new FunctionIdentifier("ann_search_filtered"),
      new ExpressionInfo(graft.plans.AnnSearchSql.getClass.getName,
        "ann_search_filtered"),
      (args: Seq[Expression]) =>
        graft.plans.AnnSearchSql.buildFiltered(args)))
    // the admission screen's SQL front door: the dedup tier's
    // at-the-door decision (and its attributed receipt) from the
    // persisted signature store, banding from the store's own dials
    ext.injectTableFunction((
      new FunctionIdentifier("dedup_screen"),
      new ExpressionInfo(graft.plans.DedupScreenSql.getClass.getName,
        "dedup_screen"),
      (args: Seq[Expression]) =>
        graft.plans.DedupScreenSql.build(args)))
    ext.injectTableFunction((
      new FunctionIdentifier("dedup_screen_attributed"),
      new ExpressionInfo(graft.plans.DedupScreenSql.getClass.getName,
        "dedup_screen_attributed"),
      (args: Seq[Expression]) =>
        graft.plans.DedupScreenSql.buildAttributed(args)))
    // the FULL three-axis gate, read-only: the attributed decision
    // frame a gated ingest would act on (lexical + decontamination +
    // semantic), previewed from pure SQL without folding or pinning
    ext.injectTableFunction((
      new FunctionIdentifier("gate_preview"),
      new ExpressionInfo(graft.plans.GatePreviewSql.getClass.getName,
        "gate_preview"),
      (args: Seq[Expression]) =>
        graft.plans.GatePreviewSql.build(args)))
    // the corpus AUDIT readouts' SQL front doors: the
    // retro-contamination audit against a versioned eval store, the
    // quad's snapshot-log positions, and the membership diff between
    // two text-tier epochs
    ext.injectTableFunction((
      new FunctionIdentifier("retro_audit"),
      new ExpressionInfo(graft.plans.CorpusAuditSql.getClass.getName,
        "retro_audit"),
      (args: Seq[Expression]) =>
        graft.plans.CorpusAuditSql.buildAudit(args)))
    ext.injectTableFunction((
      new FunctionIdentifier("corpus_epochs"),
      new ExpressionInfo(graft.plans.CorpusAuditSql.getClass.getName,
        "corpus_epochs"),
      (args: Seq[Expression]) =>
        graft.plans.CorpusAuditSql.buildEpochs(args)))
    ext.injectTableFunction((
      new FunctionIdentifier("corpus_diff"),
      new ExpressionInfo(graft.plans.CorpusAuditSql.getClass.getName,
        "corpus_diff"),
      (args: Seq[Expression]) =>
        graft.plans.CorpusAuditSql.buildDiff(args)))
    ext.injectFunction((
      new FunctionIdentifier("replace_first"),
      new ExpressionInfo(classOf[ReplaceFirst].getName, "replace_first"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "replace_first(str, search, replace) takes 3 arguments")
        ReplaceFirst(args(0), args(1), args(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "dot_product(a, b) takes 2 float-array arguments")
        DotProduct(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName,
        "unicode_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          "unicode_normalize(text[, form]) takes 1 or 2 arguments")
        val form =
          if (args.length < 2) "NFC"
          else {
            require(args(1).foldable &&
                args(1).dataType == org.apache.spark.sql.types.StringType,
              "unicode_normalize form must be a string literal")
            val v = args(1).eval()
            require(v != null,
              "unicode_normalize form must not be NULL")
            v.toString
          }
        UnicodeNormalize(args(0), form)
      }))
    ext.injectFunction((
      new FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName,
        "repetition_stats"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          "repetition_stats(text) takes 1 string argument")
        RepetitionStats(args(0))
      }))
  }
}
