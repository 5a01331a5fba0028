package graft.streaming

import graft.SparkSpec
import graft.ops.{AnnIndexStore, CorpusStore, CurationStore,
  TextIndexStore}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming maintenance of the corpus-store TRIPLE — the
  * StreamIndexSpec discipline applied to [[CorpusStore]], plus the
  * failure mode only the composition has: the MID-TRANSACTION crash,
  * where one store folds an epoch and the coordinator dies before
  * the others see it. The stream is crashed twice — once inside a
  * transaction (split-brain window: live counts observably diverge)
  * and once after a committed transaction whose checkpoint never
  * advanced (the per-store window) — and after the restarts' replays
  * every store must equal its batch-maintained twin, with membership
  * agreeing three ways.
  */
class StreamCorpusSpec extends SparkSpec {

  private def tempDir(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("corpus triple: a mid-transaction crash splits the brain " +
      "(observably), replay heals it; a post-commit crash no-ops; " +
      "stream-maintained == batch-maintained in all three stores") {
    val docs = sf("documents")
    val emb = sf("embeddings")
    val corpus = docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(docs("doc_id"), col("text"), col("embedding"))
    val dials = AnnIndexStore.Dials(col("doc_id") % 50 === 7,
      col("doc_id") % 10 === 3, m = 2, subDim = 32, iters = 2)
    val inDir = tempDir("corpus-replay-in")
    val ckptDir = tempDir("corpus-replay-ckpt")
    // seed = odd ids (contains every centroid/seed row); the evens
    // stream in as three disjoint micro-batches
    val seed = corpus.filter(col("doc_id") % 2 === 1)
    Seq(0, 2, 4).foreach { i =>
      graft.ark.Ark.writeSingleFile(
        corpus.filter(col("doc_id") % 6 === i),
        s"$inDir/slice$i.parquet")
    }
    val st = CorpusStore.build(seed, "doc_id", "text", "embedding",
      tempDir("corpus-replay-st"), annDials = Some(dials))

    val stage = new java.util.concurrent.atomic.AtomicInteger(0)
    def run(): Unit =
      spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inDir)
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[
             org.apache.spark.sql.Row], epochId: Long) =>
            if (epochId == 1 && stage.get() == 0) {
              // the window only the COMPOSITION has: the first store
              // folds the epoch, the coordinator dies before the
              // other two — under the SAME key the replay must no-op
              // here and apply there
              CurationStore.update(st.curation,
                batch.toDF().select(col("doc_id"), col("text")),
                "text", batchId = Some(s"epoch-$epochId"))
              stage.set(1)
              throw new RuntimeException("fabricated mid-transaction crash")
            }
            CorpusStore.ingest(st, batch.toDF(), "text", "embedding",
              s"epoch-$epochId")
            if (epochId == 2 && stage.compareAndSet(1, 2))
              // committed-but-unacknowledged: the whole transaction
              // landed, the checkpoint did not — replay must no-op
              // in all three stores
              throw new RuntimeException("fabricated post-commit crash")
            ()
        }
        .option("checkpointLocation", ckptDir)
        .trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination()

    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run()
    }
    // the split-brain is REAL between the crash and the replay: the
    // curation store is one epoch ahead of the other two — exactly
    // what liveCounts exists to expose
    val (c1, a1, t1) = CorpusStore.liveCounts(spark, st)
    assert(c1 > a1 && a1 == t1,
      s"mid-transaction window not demonstrated: ($c1, $a1, $t1)")
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run() // replays epoch 1 (heals), commits epoch 2, crashes
    }
    run() // replays epoch 2: a three-way no-op

    val n = corpus.count()
    assert(CorpusStore.liveCounts(spark, st) == ((n, n, n)),
      "stores did not converge on the full corpus")

    // batch twins, store by store
    val textTwin = TextIndexStore.build(
      corpus.select(col("doc_id"), col("text")), "doc_id", "text",
      tempDir("corpus-replay-text-twin"))
    assert(rows(st.text.postings(spark)) ==
      rows(textTwin.postings(spark)), "postings diverged")
    assert(st.text.stats(spark).collect().toSeq ==
      textTwin.stats(spark).collect().toSeq,
      "exact counters diverged")
    val curTwin = CurationStore.build(
      corpus.select(col("doc_id"), col("text")), "doc_id", "text",
      tempDir("corpus-replay-cur-twin"))
    assert(rows(st.curation.labels(spark)) ==
      rows(curTwin.labels(spark)), "labels diverged")
    val annTwin = AnnIndexStore.build(
      seed.select(col("doc_id"), col("embedding")), "doc_id",
      "embedding", tempDir("corpus-replay-ann-twin"),
      dials.centroidPred, dials.seedPred, dials.m, dials.subDim,
      dials.iters)
    AnnIndexStore.add(annTwin,
      corpus.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("embedding")), "embedding")
    assert(rows(st.ann.codes(spark)) == rows(annTwin.codes(spark)),
      "codes diverged from the batch fold")
  }
}
