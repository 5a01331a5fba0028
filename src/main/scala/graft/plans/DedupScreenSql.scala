package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType

/** SQL surface for the ADMISSION SCREEN — the dedup tier's
  * at-the-door read ([[graft.ops.CurationStore.screen]] /
  * [[graft.ops.CurationStore.screenAttributed]]) behind the same
  * two-front-doors convention as `text_search` and `ann_search`: a
  * `spark.sql` consumer asks the persisted signature store "which of
  * these incoming docs are near-dups of what the corpus already
  * holds" with no Scala handle in sight.
  *
  * {{{
  *   CREATE TEMP VIEW crawl AS
  *     SELECT doc_id, text FROM staging_batch;
  *   SELECT doc_id, status, dup_of
  *   FROM dedup_screen_attributed('/stores/corpus/curation',
  *                                'doc_id', 'crawl', 'text')
  *   WHERE status != 'kept'
  * }}}
  *
  * Arguments: the store DIRECTORY, the store's id column name, the
  * BATCH relation as a view/table name (the batch is itself a
  * relation, so it arrives by name — `asof_join`/`ann_search`'s
  * convention), and the view's text column name. Banding comes from
  * the store's own persisted dials ([[graft.ops.CurationStore
  * .storedDials]]) — the SQL door deliberately exposes no banding
  * arguments, so a SQL consumer can never screen a store under
  * criteria other than its own.
  *
  * `dedup_screen` returns (idCol, status); `dedup_screen_attributed`
  * adds `dup_of` — the stored best match for a `hist_dup`, the
  * within-batch canonical for a `batch_dup`, NULL for `kept`.
  * Both are pure reads: one pinned snapshot, nothing written, the
  * batch-sized shuffle shape of the DataFrame form unchanged
  * (`screen_batch100` SCALING rows).
  */
object DedupScreenSql {

  private def strArg(e: Expression, fn: String, what: String): String = {
    require(e.foldable && e.dataType == StringType,
      s"$fn: $what must be a string literal")
    val v = e.eval()
    require(v != null, s"$fn: $what must not be NULL")
    v.toString
  }

  private def args4(args: Seq[Expression], fn: String)
      : (String, String, String, String) = {
    require(args.length == 4,
      s"$fn(storeDir, idCol, batchView, textCol) takes 4 arguments")
    (strArg(args(0), fn, "store directory"),
      strArg(args(1), fn, "id column name"),
      strArg(args(2), fn, "batch view name"),
      strArg(args(3), fn, "text column name"))
  }

  /** `dedup_screen(storeDir, idCol, batchView, textCol)` →
    * (idCol, status) per batch row. */
  def build(args: Seq[Expression]): LogicalPlan = {
    val (dir, idCol, view, textCol) = args4(args, "dedup_screen")
    val s = SparkSession.active
    graft.ops.CurationStore.screen(s,
        graft.ops.CurationStore.forDir(s, dir, idCol),
        s.table(view), textCol)
      .queryExecution.logical
  }

  /** `dedup_screen_attributed(storeDir, idCol, batchView, textCol)`
    * → (idCol, status, dup_of) per batch row. */
  def buildAttributed(args: Seq[Expression]): LogicalPlan = {
    val (dir, idCol, view, textCol) =
      args4(args, "dedup_screen_attributed")
    val s = SparkSession.active
    graft.ops.CurationStore.screenAttributed(s,
        graft.ops.CurationStore.forDir(s, dir, idCol),
        s.table(view), textCol)
      .queryExecution.logical
  }
}
