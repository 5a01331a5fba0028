package graft.streaming

import graft.SparkSpec
import graft.ops.{AnnIndexStore, TextIndexStore}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming maintenance of the INDEX stores — the
  * StreamCurationSpec discipline applied to [[TextIndexStore]] and
  * [[AnnIndexStore]]: the corpus arrives as disjoint micro-batches
  * through `foreachBatch` → update/add with the EPOCH ID as the
  * idempotence key, a crash is fabricated in the
  * committed-but-unacknowledged window (store commit done, streaming
  * checkpoint never advanced), and after the restart's replay the
  * maintained store must equal a batch build bit-for-bit. An unkeyed
  * control store run through the same crashed stream shows the
  * window is real (double-appended rows / double-folded counters).
  */
class StreamIndexSpec extends SparkSpec {

  private def tempDir(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("text index: crash-replay after a committed epoch no-ops " +
      "under the epoch key; stream-maintained == batch rebuild " +
      "(postings, doclens AND exact counters)") {
    val docs = sf("documents").select("doc_id", "text")
    val inDir = tempDir("tix-replay-in")
    val ckptDir = tempDir("tix-replay-ckpt")
    (1 until 4).foreach { i =>
      graft.ark.Ark.writeSingleFile(
        docs.filter(col("doc_id") % 4 === i), s"$inDir/slice$i.parquet")
    }
    val seed = docs.filter(col("doc_id") % 4 === 0)
    val keyed = TextIndexStore.build(seed, "doc_id", "text",
      tempDir("tix-replay-keyed"))
    val unkeyed = TextIndexStore.build(seed, "doc_id", "text",
      tempDir("tix-replay-unkeyed"))

    val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): Unit =
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inDir)
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[
             org.apache.spark.sql.Row], epochId: Long) =>
            TextIndexStore.update(keyed, batch.toDF(), "text",
              batchId = Some(s"epoch-$epochId"))
            // the unkeyed control must only see each slice ONCE plus
            // the replayed epoch — feed it filtered so its ids stay
            // disjoint per call except for the fabricated replay
            TextIndexStore.update(unkeyed, batch.toDF()
              .withColumn("doc_id", col("doc_id") + epochId * 1000000L),
              "text")
            if (epochId == 1 && armed.getAndSet(false))
              throw new RuntimeException("fabricated crash")
            ()
        }
        .option("checkpointLocation", ckptDir)
        .trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination()

    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run()
    }
    run() // restart from the checkpoint: epoch 1 replays

    val rebuilt = TextIndexStore.build(docs, "doc_id", "text",
      tempDir("tix-replay-rebuild"))
    assert(rows(keyed.postings(spark)) == rows(rebuilt.postings(spark)),
      "postings diverged")
    assert(rows(keyed.doclens(spark)) == rows(rebuilt.doclens(spark)),
      "doclens diverged")
    assert(keyed.stats(spark).collect().toSeq ==
      rebuilt.stats(spark).collect().toSeq, "exact counters diverged")
    // the unkeyed control double-counted the replayed epoch: its
    // exact doc counter exceeds the corpus
    val unkeyedN = unkeyed.stats(spark).select("n").head().getLong(0)
    assert(unkeyedN > docs.count(), s"window not demonstrated: " +
      s"unkeyed n=$unkeyedN vs corpus ${docs.count()}")
  }

  test("ANN index: crash-replay after a committed epoch no-ops " +
      "under the epoch key; stream-maintained == batch add under " +
      "the same frozen models") {
    val emb = sf("embeddings")
    val dials = AnnIndexStore.CorpusDials
    val inDir = tempDir("aix-replay-in")
    val ckptDir = tempDir("aix-replay-ckpt")
    // history (models) = vec_id % 5 != 4 — centroid/seed slices land
    // inside it; the streamed batches are the held-out fifth, split
    // into three disjoint micro-batches
    val history = emb.filter(col("vec_id") % 5 =!= 4)
    val held = emb.filter(col("vec_id") % 5 === 4)
    (0 until 3).foreach { i =>
      graft.ark.Ark.writeSingleFile(
        held.filter(col("vec_id") % 3 === i), s"$inDir/slice$i.parquet")
    }
    val keyed = AnnIndexStore.build(history, "vec_id", "embedding",
      tempDir("aix-replay-keyed"), dials.centroidPred, dials.seedPred,
      dials.m, dials.subDim, dials.iters)
    val unkeyed = AnnIndexStore.build(history, "vec_id", "embedding",
      tempDir("aix-replay-unkeyed"), dials.centroidPred,
      dials.seedPred, dials.m, dials.subDim, dials.iters)

    val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): Unit =
      spark.readStream.schema(held.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inDir)
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[
             org.apache.spark.sql.Row], epochId: Long) =>
            AnnIndexStore.add(keyed, batch.toDF(), "embedding",
              batchId = Some(s"epoch-$epochId"))
            AnnIndexStore.add(unkeyed, batch.toDF()
              .withColumn("vec_id", col("vec_id") + epochId * 1000000L),
              "embedding")
            if (epochId == 1 && armed.getAndSet(false))
              throw new RuntimeException("fabricated crash")
            ()
        }
        .option("checkpointLocation", ckptDir)
        .trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination()

    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run()
    }
    run() // restart: epoch 1 replays

    // the batch twin: same models, the whole held-out set folded as
    // one add — codes are per-row under frozen models, so the union
    // of disjoint batches equals the one-shot fold exactly
    val batchTwin = AnnIndexStore.build(history, "vec_id", "embedding",
      tempDir("aix-replay-twin"), dials.centroidPred, dials.seedPred,
      dials.m, dials.subDim, dials.iters)
    AnnIndexStore.add(batchTwin, held, "embedding")
    assert(rows(keyed.codes(spark)) == rows(batchTwin.codes(spark)),
      "stream-maintained codes diverged from the batch fold")
    // the unkeyed control double-appended the replayed epoch
    assert(unkeyed.codes(spark).count() > batchTwin.codes(spark).count(),
      "window not demonstrated on the unkeyed control")
  }
}
