package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ONE manifest flip per (store, batch operation) — the versioning
  * tax's floor, pinned. The r15 verdict advisory suspected stages of
  * one store "flip per stage" inside a transaction; the truth at HEAD
  * is that every store operation stages ALL its versions first and
  * commits them through a single [[StoreVersions.flip]] (update's
  * labels+stats, compact's five re-resolved stages, and so on). This
  * spec makes that structural claim an enforced invariant: the
  * snapshot log records exactly one entry per flip, and its LAST SEQ
  * is monotone across GC — so "last seq grew by exactly one" IS
  * "this operation flipped exactly once". A regression that splits a
  * commit into per-stage flips (reopening the mixed-stage crash
  * window AND multiplying the per-flip listing/snapshot tax inside
  * transaction capstones like q169/q170) fails here by name.
  */
class FlipCountSpec extends SparkSpec {

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("flip-count").toString
  private lazy val corpus = {
    val docs = sf("documents")
    val emb = sf("embeddings")
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(docs("doc_id"), col("text"), col("source"),
        col("embedding"))
  }
  private lazy val dials = AnnIndexStore.Dials(
    col("doc_id") % 50 === 7, col("doc_id") % 10 === 3,
    m = 2, subDim = 32, iters = 2)

  test("every transaction step flips each touched store EXACTLY " +
      "once: build, ingest, gated ingest, delete, compact — across " +
      "all four tiers") {
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val st = CorpusStore.build(
      corpus.filter(col("doc_id") % 5 =!= 4), "doc_id", "text",
      "embedding", s"$tmp/quad", annDials = Some(dials),
      sourceCol = Some("source"))
    def seqs(): Seq[Int] =
      Seq(st.curation.dir, st.ann.dir, st.text.dir,
        st.stats.get.dir).map(d =>
        StoreVersions.snapshots(fs, d).lastOption.map(_._1)
          .getOrElse(0))
    def assertOneFlipEach(before: Seq[Int], what: String): Seq[Int] = {
      val now = seqs()
      assert(now == before.map(_ + 1),
        s"$what: expected exactly one flip per store, " +
          s"seqs $before -> $now (curation, ann, text, stats)")
      now
    }
    var at = seqs()
    assert(at == Seq(1, 1, 1, 1),
      s"build is one flip per store, got $at")
    val fifth = corpus.filter(col("doc_id") % 5 === 4)
    CorpusStore.ingest(st, fifth.filter(col("doc_id") % 10 === 9),
      "text", "embedding", "fc-ingest")
    at = assertOneFlipEach(at, "plain ingest")
    CorpusStore.ingestScreened(st,
      fifth.filter(col("doc_id") % 10 === 4)
        .withColumn("doc_id", col("doc_id") + 3000000), "text",
      "embedding", "fc-gated")
    at = assertOneFlipEach(at, "gated ingest")
    val doomed = corpus.filter(col("doc_id") % 10 === 9)
    CorpusStore.delete(st, doomed.select("doc_id"), "fc-del",
      Some(doomed))
    at = assertOneFlipEach(at, "delete")
    val live = corpus.filter(col("doc_id") % 10 =!= 9)
      .unionByName(fifth.filter(col("doc_id") % 10 === 4)
        .withColumn("doc_id", col("doc_id") + 3000000))
    CorpusStore.compact(spark, st, liveCorpus = Some(live))
    assertOneFlipEach(at, "compact")
  }
}
