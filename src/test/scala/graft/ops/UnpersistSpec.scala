package graft.ops

import graft.SparkSpec
import graft.queries.{Registry, SimilarityQueries, TextQueries}
import org.apache.spark.sql.functions._

/** Cached-block hygiene: operators must not leave persisted blocks
  * behind after their result is consumed — a long-lived session (a
  * notebook, a service) would otherwise accumulate storage until
  * unrelated queries start spilling. The one documented exception is
  * [[Dedup.clusters]], whose returned frame IS a persisted fixpoint
  * (see its scaladoc); everything downstream of it must still clean up
  * to exactly that one frame.
  */
class UnpersistSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def persistedCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  private def assertClean(run: => Unit, what: String): Unit = {
    spark.catalog.clearCache()
    // earlier suites may leave lineage-cut label frames behind
    // (dedupCorpusBest's localCheckpoint — cleaner-managed, but not
    // deterministically gone yet); reset to a clean slate so the
    // assertions below measure only what `run` itself leaves.
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    assert(persistedCount == 0, s"dirty session before $what")
    run
    assert(persistedCount == 0,
      s"$what left $persistedCount persisted RDD(s) behind")
  }

  test("estimate tier, jaccard, IVF and incremental leave zero cached blocks") {
    assertClean(
      TextQueries.q43.run(spark, dir).collect(), "minhashEstimatePairs")
    assertClean(
      TextQueries.q26.run(spark, dir).collect(), "ngramJaccardPairs")
    assertClean(
      SimilarityQueries.q32.run(spark, dir).collect(), "ivfSearch nprobe=1")
    assertClean(
      SimilarityQueries.q51.run(spark, dir).collect(), "ivfSearch nprobe=2")
    assertClean({
      val docs = Registry.table(spark, dir, "documents")
      val store = Dedup.minhashSignatures(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", 16)
      val d = Dedup.incrementalDecisions(
        docs.filter(col("doc_id") % 2 === 1), store, "doc_id", "text")
      d.collect()
      // embeds clusters() → only its fixpoint frame may remain
      assert(persistedCount <= 1,
        s"incrementalDecisions left $persistedCount blocks (max 1 allowed)")
      spark.catalog.clearCache()
    }, "incrementalDecisions + clearCache")
  }

  test("decontaminate, k-means trainer and semDedup leave zero cached blocks") {
    assertClean(
      TextQueries.q55.run(spark, dir).collect(), "decontaminate")
    assertClean(
      SimilarityQueries.q56.run(spark, dir).collect(), "kmeansCentroids")
    assertClean(
      SimilarityQueries.q57.run(spark, dir).collect(), "semDedup")
  }

  test("PQ, IVFPQ and the CMS sketch leave zero cached blocks") {
    assertClean(
      SimilarityQueries.q84.run(spark, dir).collect(), "pqTopK")
    assertClean(
      SimilarityQueries.q90.run(spark, dir).collect(), "ivfPqTopK")
    assertClean(
      TextQueries.q85.run(spark, dir).collect(), "heavyHittersCms")
  }

  test("gated ingest: the internal decision cache drops before the " +
      "frame returns — only clusters() fixpoint blocks may remain") {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val docs = Registry.table(spark, dir, "documents")
    val emb = Registry.table(spark, dir, "embeddings")
    val corpus = docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(docs("doc_id"), col("text"), col("embedding"))
    val st = CorpusStore.build(corpus.filter(col("doc_id") % 5 =!= 4),
      "doc_id", "text", "embedding",
      java.nio.file.Files.createTempDirectory("unpersist-gate")
        .toString + "/quad")
    val (_, dec) = CorpusStore.ingestScreened(st,
      corpus.filter(col("doc_id") % 5 === 4), "text", "embedding",
      "hyg-1")
    dec.collect()
    // the kept cache is private to the transaction and must be gone;
    // the decision frame is file-backed (materialized once — r17),
    // so only the SCREEN's clusters() fixpoint may remain: the
    // gated-fold fast path skips the curation fold's fixpoint
    // entirely (GatedFoldSpec), so the old second block is gone too
    assert(persistedCount <= 1,
      s"gated ingest left $persistedCount blocks (max 1 fixpoint)")
    spark.catalog.clearCache()
    assert(persistedCount == 0,
      "blocks survived clearCache after the gated ingest")
  }

  test("clusters: per-round frames are unpersisted, only the fixpoint remains") {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val cl = Dedup.clusters(pairs, "a", "b")
    // the loop ran eagerly; everything except the returned frame is gone
    assert(persistedCount == 1,
      s"expected exactly the fixpoint frame, got $persistedCount")
    val got = cl.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    cl.unpersist()
    assert(persistedCount == 0)
  }
}
