package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The cross-store transaction layer's contract is CONVERGENCE UNDER
  * REPLAY: a coordinator crash between any two per-store calls leaves
  * a prefix of the stores at the new epoch, and re-issuing the same
  * transaction (same batchId) must no-op where it already applied and
  * apply where it did not — with [[CorpusStore.liveCounts]] equal
  * across the three stores after every COMPLETED transaction, and
  * each store serving exactly what its own maintenance contract says.
  */
class CorpusStoreSpec extends SparkSpec {

  private val terms = Seq("join", "vector", "stream")
  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("corpus-store").toString
  private lazy val corpus = {
    val docs = sf("documents")
    val emb = sf("embeddings")
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(docs("doc_id"), col("text"), col("embedding"))
  }
  private lazy val dials = AnnIndexStore.Dials(
    col("doc_id") % 50 === 7, col("doc_id") % 10 === 3,
    m = 2, subDim = 32, iters = 2)

  private def assertFrameEqual(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, what: String): Unit = {
    assert(a.count() == b.count(), s"$what: row counts differ")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what: symmetric difference is non-empty")
  }

  test("ingest/delete transactions converge under mid-crash replay; " +
      "live counts agree after every completed transaction; each " +
      "store serves its own contract") {
    val base = corpus.filter(col("doc_id") % 5 =!= 4)
    val batch = corpus.filter(col("doc_id") % 5 === 4)
    val st = CorpusStore.build(base, "doc_id", "text", "embedding",
      s"$tmp/cs", annDials = Some(dials))
    val n0 = base.count()
    assert(CorpusStore.liveCounts(spark, st) == ((n0, n0, n0)),
      "stores disagree on membership right after build")

    // fabricate the mid-transaction crash: the FIRST store in the
    // application order already folded the batch, then the
    // coordinator died — the replay must no-op there and apply to
    // the other two
    CurationStore.update(st.curation,
      batch.select(col("doc_id"), col("text")), "text",
      batchId = Some("b1"))
    CorpusStore.ingest(st, batch, "text", "embedding", "b1")
    val n1 = corpus.count()
    assert(CorpusStore.liveCounts(spark, st) == ((n1, n1, n1)),
      "replayed ingest did not converge the three stores")
    // curation applied EXACTLY once: one label set equal to a
    // rebuild's (a double-fold would duplicate signature rows)
    val rebuilt = CurationStore.build(
      corpus.select(col("doc_id"), col("text")), "doc_id", "text",
      s"$tmp/cur-rebuild")
    assertFrameEqual(st.curation.labels(spark), rebuilt.labels(spark),
      "labels after crash-replay ingest vs rebuild")
    // a SECOND full replay is a three-way no-op
    CorpusStore.ingest(st, batch, "text", "embedding", "b1")
    assert(CorpusStore.liveCounts(spark, st) == ((n1, n1, n1)),
      "batchId replay re-applied somewhere")

    // same discipline for the takedown: ann already folded d1
    val doomed = corpus.filter(col("doc_id") % 10 === 6)
      .select("doc_id")
    AnnIndexStore.delete(st.ann, doomed, batchId = Some("d1"))
    CorpusStore.delete(st, doomed, "d1")
    val n2 = corpus.filter(col("doc_id") % 10 =!= 6).count()
    assert(CorpusStore.liveCounts(spark, st) == ((n2, n2, n2)),
      "replayed delete did not converge the three stores")

    // per-store serving contracts through the orchestrator, after
    // the removals become physical
    val stc = CorpusStore.compact(spark, st)
    assert(CorpusStore.liveCounts(spark, stc) == ((n2, n2, n2)),
      "compact changed membership")
    val net = corpus.filter(col("doc_id") % 10 =!= 6)
    // text: collection stats track the net corpus == rebuild
    val textRebuild = TextIndexStore.build(
      net.select(col("doc_id"), col("text")), "doc_id", "text",
      s"$tmp/text-rebuild")
    assertFrameEqual(TextIndexStore.bm25(spark, stc.text, terms),
      TextIndexStore.bm25(spark, textRebuild, terms),
      "text serving vs net-corpus rebuild")
    // curation: compact re-resolved the topology == rebuild
    val curRebuild = CurationStore.build(
      net.select(col("doc_id"), col("text")), "doc_id", "text",
      s"$tmp/cur-net-rebuild")
    assertFrameEqual(stc.curation.labels(spark),
      curRebuild.labels(spark), "curation labels vs net rebuild")
    // ann: models frozen at build — NOT a rebuild; equal to a
    // reference single store maintained by the same sequence
    val ref = AnnIndexStore.build(
      base.select(col("doc_id"), col("embedding")), "doc_id",
      "embedding", s"$tmp/ann-ref", dials.centroidPred,
      dials.seedPred, dials.m, dials.subDim, dials.iters)
    AnnIndexStore.add(ref, batch.select(col("doc_id"), col("embedding")),
      "embedding", batchId = Some("b1"))
    AnnIndexStore.delete(ref, doomed, batchId = Some("d1"))
    val queries = corpus.filter(col("doc_id") % 100 === 3)
      .select(col("doc_id").as("qid"), col("embedding"))
    assertFrameEqual(
      AnnIndexStore.search(spark, stc.ann, queries, "qid",
        "embedding", k = 10),
      AnnIndexStore.search(spark, ref, queries, "qid",
        "embedding", k = 10),
      "ann serving vs identically-maintained reference store")
    // and frozen-models means the ANN rebuild DIFFERS (fixture
    // strength: the distinction the reference comparison relies on)
    val annRebuild = AnnIndexStore.build(
      net.select(col("doc_id"), col("embedding")), "doc_id",
      "embedding", s"$tmp/ann-rebuild", dials.centroidPred,
      dials.seedPred, dials.m, dials.subDim, dials.iters)
    val a = AnnIndexStore.search(spark, stc.ann, queries, "qid",
      "embedding", k = 10)
    val b = AnnIndexStore.search(spark, annRebuild, queries, "qid",
      "embedding", k = 10)
    assert(!(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty),
      "fixture too easy: frozen-model serving equals a net rebuild")
  }

  test("liveCounts: a sub-shingle-width doc counts in ann and text " +
      "but never signs — the documented healthy offset, not " +
      "split-brain (and the default dials re-key to idCol)") {
    import spark.implicits._
    val tiny = spark.range(60).select(col("id").as("doc_id"),
      // id 2 is shorter than the shingle width (2 tokens < k = 3):
      // it can never LSH-match anything, so the curation store
      // rightly has no record of it
      when(col("id") === 2, "hello world")
        .otherwise(concat(lit("tok"), col("id"),
          lit(" alpha beta gamma"))).as("text"),
      transform(sequence(lit(0), lit(63)),
        j => (col("id") * j % 7).cast("float") / 7f).as("embedding"))
    // default dials: CorpusDials' moduli re-keyed to doc_id —
    // centroid rows (7, 57) and seed rows (3, 13, ...) exist
    val st = CorpusStore.build(tiny, "doc_id", "text", "embedding",
      s"$tmp/tiny")
    assert(CorpusStore.liveCounts(spark, st) == ((59L, 60L, 60L)),
      "expected the curation count one short of ann/text")
  }
}
