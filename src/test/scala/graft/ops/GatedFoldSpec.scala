package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The gated-fold fast path (r17 optimization): a batch that passed
  * [[CurationStore.screen]] at the store's OWN dials with uncapped
  * buckets adds ZERO candidate pairs when its `kept` survivors fold —
  * any kept↔store or kept↔kept candidate scoring ≥ minEst would have
  * made its doc hist_dup / batch_dup at the screen — so
  * `update(screenedNoNewPairs = true)` may skip pair discovery and the
  * label fixpoint outright. These tests pin (a) the invariant itself
  * on real near-dup data, and (b) stage-for-stage equality of the fast
  * fold against the generic fold on the same kept batch.
  */
class GatedFoldSpec extends SparkSpec {

  private lazy val docs = sf("documents")
  private lazy val hist = docs.filter(col("doc_id") % 2 === 0)
  private lazy val batch = docs.filter(col("doc_id") % 2 === 1)

  private def freshStore(tag: String): CurationStore.Store =
    CurationStore.build(hist, "doc_id", "text",
      java.nio.file.Files.createTempDirectory(s"gatedfold-$tag")
        .toString + "/store")

  test("screened kept survivors add zero pairs at the store's dials " +
      "(the fast fold's certificate)") {
    val store = freshStore("inv")
    val dec = CurationStore.screen(spark, store, batch, "text")
    val kept = batch.join(
      dec.filter(col("status") === "kept").select("doc_id"),
      Seq("doc_id"), "left_semi")
    // the batch genuinely exercises the gate: some rows are rejected
    val n = dec.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n.getOrElse("kept", 0L) > 0 &&
      (n.getOrElse("hist_dup", 0L) + n.getOrElse("batch_dup", 0L)) > 0,
      s"fixture too easy: $n")
    val (h, b, e) = CurationStore.storedDials(spark, store)
    val keptSigs = Dedup.minhashSignatures(kept, "doc_id", "text", h)
    val newPairs = Dedup.estimatePairsForNewBatch(keptSigs,
        store.signatures(spark), "doc_id", h, b)
      .filter(col("est_jaccard") >= e)
    assert(newPairs.isEmpty,
      s"kept survivors scored ${newPairs.count()} pairs >= $e — " +
        "the fast fold's zero-pairs certificate is violated")
  }

  test("fast fold == generic fold, stage for stage") {
    val fast = freshStore("fast")
    val slow = freshStore("slow")
    // one shared screen (both stores were built identically)
    val dec = CurationStore.screen(spark, fast, batch, "text")
    val kept = batch.join(
      dec.filter(col("status") === "kept").select("doc_id"),
      Seq("doc_id"), "left_semi")
    CurationStore.update(fast, kept, "text",
      batchId = Some("gf-1"), screenedNoNewPairs = true)
    CurationStore.update(slow, kept, "text", batchId = Some("gf-1"))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
        .toSeq.sorted
    assert(rows(fast.signatures(spark)) == rows(slow.signatures(spark)),
      "signature stages differ")
    assert(rows(fast.pairs(spark)) == rows(slow.pairs(spark)),
      "pair stages differ")
    assert(rows(fast.labels(spark)) == rows(slow.labels(spark)),
      "effective labels differ")
    assert(CurationStore.liveCount(spark, fast) ==
      CurationStore.liveCount(spark, slow), "live counters differ")
    // replay is a detected no-op on the fast path too
    val before = rows(fast.signatures(spark))
    CurationStore.update(fast, kept, "text",
      batchId = Some("gf-1"), screenedNoNewPairs = true)
    assert(rows(fast.signatures(spark)) == before,
      "fast-path replay double-appended the batch")
  }
}
