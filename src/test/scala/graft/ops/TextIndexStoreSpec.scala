package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted BM25 index must be a pure materialization of the
  * from-text path (shared scoring kernel), its incremental fold must
  * equal a full rebuild bit-for-bit — including the floating scores,
  * which the integer-exact q159 oracle deliberately leaves to THIS
  * spec (one engine, one rounding) — and the serving scan must push
  * the term probe into the postings read.
  */
class TextIndexStoreSpec extends SparkSpec {

  private val terms = Seq("join", "vector", "stream")
  private lazy val docs = sf("documents").select("doc_id", "text")
  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("text-index").toString
  private lazy val idx =
    TextIndexStore.build(docs, "doc_id", "text", s"$tmp/full")

  private def fromCorpus = {
    val dl = docs.select(col("doc_id"),
      TextOps.tokenCount(col("text")).cast("bigint").as("dl"))
    val stats = dl.agg(count(lit(1)).as("_n"),
      (sum("dl") / count(lit(1))).as("_avgdl"))
    val tf = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    TextOps.bm25ScoreFrames(tf, dl, stats, "doc_id", terms)
  }

  private def assertFrameEqual(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, what: String): Unit = {
    assert(a.count() == b.count(), s"$what: row counts differ")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what: symmetric difference is non-empty")
  }

  test("stored-index bm25 equals the from-corpus kernel") {
    assertFrameEqual(TextIndexStore.bm25(spark, idx, terms),
      fromCorpus, "bm25 scores")
  }

  test("update == rebuild: postings, stats AND floating scores") {
    val old = docs.filter(col("doc_id") % 5 =!= 4)
    val batch = docs.filter(col("doc_id") % 5 === 4)
    val inc = TextIndexStore.build(old, "doc_id", "text", s"$tmp/inc")
    TextIndexStore.update(inc, batch, "text", Some("b1"))
    val full = TextIndexStore.build(docs, "doc_id", "text",
      s"$tmp/rebuild")
    assertFrameEqual(inc.postings(spark), full.postings(spark),
      "postings")
    assert(inc.stats(spark).collect().toSeq ==
      full.stats(spark).collect().toSeq, "stats counters differ")
    // the floating contract q159's integer oracle delegates here:
    // same engine, same rounding — every score must agree
    assertFrameEqual(TextIndexStore.bm25(spark, inc, terms),
      TextIndexStore.bm25(spark, full, terms), "scores after update")
    // a batchId replay is a detected no-op
    val n = inc.postings(spark).count()
    TextIndexStore.update(inc, batch, "text", Some("b1"))
    assert(inc.postings(spark).count() == n, "replay re-appended")
  }

  test("the term probe pushes into the postings scan") {
    val df = TextIndexStore.bm25(spark, idx, terms)
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def nodes(p: SparkPlan): Seq[SparkPlan] = (p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case s: QueryStageExec => s +: nodes(s.plan)
      case o => o +: o.children.flatMap(nodes)
    }) ++ p.subqueries.flatMap(nodes)
    val scan = nodes(df.queryExecution.executedPlan).collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("postings"))
        => s
    }.getOrElse(fail("no postings scan in the serving plan"))
    assert(scan.metadata.get("PushedFilters")
        .exists(f => f.contains("In(token") || f.contains("token#")),
      s"term probe not pushed: ${scan.metadata.get("PushedFilters")}")
  }
}
