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

  private def intArg(e: Expression, what: String): Int = {
    require(e.foldable &&
        (e.dataType == org.apache.spark.sql.types.IntegerType ||
          e.dataType == org.apache.spark.sql.types.LongType),
      s"$what must be an integer literal")
    val v = e.eval()
    require(v != null, s"$what must not be NULL")
    v.toString.toInt
  }

  /** `text_match(storeDir, idCol, terms[, m])` — boolean retrieval
    * from the stored postings: documents matching at least `m` of
    * the query terms (default: all of them — conjunctive AND), with
    * the match breadth and matched-term tf, i.e.
    * [[graft.ops.TextIndexStore.matchAtLeast]]'s frame. One uniform
    * (id, matched_terms, tf_sum) schema for every `m`, so the AND
    * form is just the quorum form at m = |terms| (the store spec's
    * reduction law).
    */
  def buildMatch(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3 || args.length == 4,
      "text_match(storeDir, idCol, terms[, m]) takes 3 or 4 arguments")
    val dir = strArg(args(0), "store directory")
    val idCol = strArg(args(1), "id column name")
    val terms = strArg(args(2), "terms")
      .split("[,\\s]+").toSeq.filter(_.nonEmpty)
    require(terms.nonEmpty, "text_match: terms must be non-empty")
    val m =
      if (args.length < 4) terms.distinct.size
      else intArg(args(3), "text_match: m")
    val s = SparkSession.active
    graft.ops.TextIndexStore
      .matchAtLeast(s, graft.ops.TextIndexStore.forDir(s, dir, idCol),
        terms, m)
      .queryExecution.logical
  }

  /** `text_phrase(storeDir, idCol, phrase[, slop])` — positional
    * retrieval from the stored index: exact consecutive phrase at
    * the default slop 0 ([[graft.ops.TextIndexStore.phraseMatch]]),
    * ordered proximity with at most `slop − 1` other tokens between
    * consecutive terms past it
    * ([[graft.ops.TextIndexStore.proximityMatch]] — whose slop = 1
    * IS the phrase, the store spec's identity, so the two arms meet
    * at the boundary). Returns (id, hits).
    */
  def buildPhrase(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3 || args.length == 4,
      "text_phrase(storeDir, idCol, phrase[, slop]) takes 3 or 4 " +
        "arguments")
    val dir = strArg(args(0), "store directory")
    val idCol = strArg(args(1), "id column name")
    val phrase = strArg(args(2), "phrase")
      .split("[,\\s]+").toSeq.filter(_.nonEmpty)
    require(phrase.nonEmpty, "text_phrase: phrase must be non-empty")
    val slop = if (args.length < 4) 0
      else intArg(args(3), "text_phrase: slop")
    val s = SparkSession.active
    val idx = graft.ops.TextIndexStore.forDir(s, dir, idCol)
    val df =
      if (slop <= 0) graft.ops.TextIndexStore.phraseMatch(s, idx,
        phrase)
      else graft.ops.TextIndexStore.proximityMatch(s, idx, phrase,
        slop)
    df.queryExecution.logical
  }
}
