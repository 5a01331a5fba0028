package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** SQL surface for the persisted ANN index — the TVF builders behind
  * `GraftExtensions`' `ann_search` / `ann_search_filtered`
  * registrations, completing the serving stores' SQL story
  * ([[TextSearchSql]] covers the sparse side): a `spark.sql` user
  * answers a dense query batch from the index a DataFrame pipeline
  * built and maintains, with no Scala handle in sight.
  *
  * {{{
  *   CREATE TEMP VIEW qs AS
  *     SELECT vec_id AS qid, embedding FROM embeddings
  *     WHERE vec_id % 100 = 3;
  *   SELECT qid, vec_id, adc, rank
  *   FROM ann_search('/stores/wiki-ann', 'vec_id', 'qs',
  *                   'qid', 'embedding', 10)
  *   ORDER BY qid, rank
  * }}}
  *
  * Arguments: the store DIRECTORY, the store's id column name, the
  * QUERY relation as a view/table NAME (the query batch is itself a
  * relation, so it arrives by name — the same convention as
  * `asof_join`'s view-name form), the view's query-id and vector
  * column names, `k`, and optionally `nprobe`. The filtered form
  * inserts an allow-list view name (one `idCol` column) before `k`
  * — [[graft.ops.AnnIndexStore.searchFiltered]]'s pre-filter
  * semantics, NOT a post-filter on this function's output (a
  * post-filter under-fills k; the distinction q166 pins).
  *
  * The PQ shape (`m`, `subDim`) is recovered from the committed
  * codebooks stage ([[graft.ops.AnnIndexStore.forDir]]), so the SQL
  * consumer needs nothing but the directory. Unlike `text_search`
  * this builder is NOT a pure plan constructor: ANN serving ROUTES
  * — each query's probed cells are chosen by a driver-side job
  * bounded by the query-batch size and `PruneMaxCells` (the
  * [[graft.ops.AnnIndexStore.search]] scaladoc prices it) — so that
  * bounded routing job runs at SQL analysis time, exactly as it
  * would at DataFrame construction. The serving scan itself stays
  * lazily planned and reads only the probed cell partitions.
  */
object AnnSearchSql {

  private def strArg(e: Expression, fn: String, what: String): String = {
    require(e.foldable && e.dataType == StringType,
      s"$fn: $what must be a string literal")
    val v = e.eval()
    require(v != null, s"$fn: $what must not be NULL")
    v.toString
  }

  private def intArg(e: Expression, fn: String, what: String): Int = {
    require(e.foldable &&
        (e.dataType == IntegerType || e.dataType == LongType),
      s"$fn: $what must be an integer literal")
    val v = e.eval()
    require(v != null, s"$fn: $what must not be NULL")
    val n = v.toString.toLong
    require(n >= Int.MinValue && n <= Int.MaxValue,
      s"$fn: $what out of int range ($n)")
    n.toInt
  }

  /** `ann_search(storeDir, idCol, queriesView, qidCol, vecCol, k[,
    * nprobe])` — [[graft.ops.AnnIndexStore.search]] through the SQL
    * door: (qid, idCol, adc, rank ≤ k) per query row of the named
    * view. */
  def build(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 6 || args.length == 7,
      "ann_search(storeDir, idCol, queriesView, qidCol, vecCol, k[, " +
        "nprobe]) takes 6 or 7 arguments")
    val fn = "ann_search"
    val dir = strArg(args(0), fn, "store directory")
    val idCol = strArg(args(1), fn, "id column name")
    val view = strArg(args(2), fn, "queries view name")
    val qidCol = strArg(args(3), fn, "query-id column name")
    val vecCol = strArg(args(4), fn, "vector column name")
    val k = intArg(args(5), fn, "k")
    val nprobe = if (args.length < 7) 1 else intArg(args(6), fn, "nprobe")
    val s = SparkSession.active
    graft.ops.AnnIndexStore.search(s,
        graft.ops.AnnIndexStore.forDir(s, dir, idCol),
        s.table(view), qidCol, vecCol, k, nprobe)
      .queryExecution.logical
  }

  /** `ann_search_filtered(storeDir, idCol, queriesView, qidCol,
    * vecCol, allowedView, k[, nprobe])` — the metadata-constrained
    * serve ([[graft.ops.AnnIndexStore.searchFiltered]]): top-k among
    * the ids in `allowedView` (one `idCol` column), masked INSIDE
    * the probed cells with every model frozen corpus-wide. */
  def buildFiltered(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 7 || args.length == 8,
      "ann_search_filtered(storeDir, idCol, queriesView, qidCol, " +
        "vecCol, allowedView, k[, nprobe]) takes 7 or 8 arguments")
    val fn = "ann_search_filtered"
    val dir = strArg(args(0), fn, "store directory")
    val idCol = strArg(args(1), fn, "id column name")
    val view = strArg(args(2), fn, "queries view name")
    val qidCol = strArg(args(3), fn, "query-id column name")
    val vecCol = strArg(args(4), fn, "vector column name")
    val allowed = strArg(args(5), fn, "allowed view name")
    val k = intArg(args(6), fn, "k")
    val nprobe = if (args.length < 8) 1 else intArg(args(7), fn, "nprobe")
    val s = SparkSession.active
    graft.ops.AnnIndexStore.searchFiltered(s,
        graft.ops.AnnIndexStore.forDir(s, dir, idCol),
        s.table(allowed), s.table(view), qidCol, vecCol, k, nprobe)
      .queryExecution.logical
  }
}
