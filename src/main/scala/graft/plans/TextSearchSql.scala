package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType

/** SQL surface for the persisted BM25 text index — the TVF builder
  * behind `GraftExtensions`' `text_search` registration, extending
  * the [[AsOfSql]] one-operator-two-front-doors story from the join
  * family to the SERVING STORES: a `spark.sql` user queries the
  * index a DataFrame pipeline built and maintains, with no Scala
  * handle in sight.
  *
  * {{{
  *   SELECT doc_id, score
  *   FROM text_search('/stores/wiki-text', 'doc_id', 'join vector')
  *   ORDER BY score DESC, doc_id LIMIT 20
  * }}}
  *
  * Arguments: the store DIRECTORY (string literal — the same root
  * every [[graft.ops.TextIndexStore]] call takes), the store's id
  * column name, and the query terms as one string literal split on
  * whitespace/commas. The result is the full scored frame of
  * [[graft.ops.TextIndexStore.bm25]] — per-document BM25 over the
  * stored postings/doclens/stats, reader-isolated through the
  * manifest pin like every other consumer — so ranking and cutting
  * compose in SQL (`ORDER BY score DESC LIMIT k`), which keeps this
  * builder a PURE plan constructor: no job runs at analysis time.
  * (The block-max [[graft.ops.TextIndexStore.bm25TopK]] serve makes
  * driver-side pruning decisions — jobs — so it deliberately stays a
  * DataFrame-API surface; Catalyst's own top-k rewrite (TakeOrdered)
  * already serves the SQL form's ORDER BY/LIMIT without scoring
  * fewer documents, the trade the bm25TopK scaladoc prices.)
  *
  * The bucket layout is detected from the session catalog
  * ([[graft.ops.TextIndexStore.forDir]]) so a bucketed store keeps
  * its zero-exchange token aggregation through the SQL door too.
  * TextSearchSqlSpec pins SQL == DataFrame equality on plain and
  * bucketed stores, the SQL-side top-k against the DataFrame chain,
  * and the loud errors.
  */
object TextSearchSql {

  private def strArg(e: Expression, what: String): String = {
    require(e.foldable && e.dataType == StringType,
      s"text_search: $what must be a string literal")
    val v = e.eval()
    require(v != null, s"text_search: $what must not be NULL")
    v.toString
  }

  def build(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3,
      "text_search(storeDir, idCol, terms) takes 3 arguments")
    val dir = strArg(args(0), "store directory")
    val idCol = strArg(args(1), "id column name")
    val terms = strArg(args(2), "terms")
      .split("[,\\s]+").toSeq.filter(_.nonEmpty)
    require(terms.nonEmpty, "text_search: terms must be non-empty")
    val s = SparkSession.active
    graft.ops.TextIndexStore
      .bm25(s, graft.ops.TextIndexStore.forDir(s, dir, idCol), terms)
      .queryExecution.logical
  }
}
