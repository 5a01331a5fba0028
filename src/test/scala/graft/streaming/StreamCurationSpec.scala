package graft.streaming

import graft.SparkSpec
import graft.ops.CurationStore
import org.apache.spark.sql.functions._

/** Streaming maintenance of the LABEL store — the CurationStore
  * analog of StreamStatsSpec: the corpus arrives as four disjoint
  * micro-batches through `foreachBatch` → CurationStore.update, and
  * the maintained store must equal a from-scratch batch build stage
  * by stage (signatures, pairs, labels — the q126 identity,
  * compounded over a real streaming execution). The crash-replay
  * test fabricates the committed-but-unacknowledged window (store
  * swap committed, streaming checkpoint never advanced): with the
  * epoch id passed as the update's `batchId` the replayed epoch is
  * detected as already applied; without it the replay double-appends
  * the batch's signature rows — the same window q131's foreachBatch
  * closes for the stats store, proven here for the dedup store.
  */
class StreamCurationSpec extends SparkSpec {

  private def tempDir(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def stage(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("crash-replay after a committed batch: batchId makes the " +
      "replayed epoch a no-op; the maintained store equals a rebuild") {
    import org.apache.spark.sql.streaming.Trigger
    val docs = sf("documents")
    val inDir = tempDir("cur-replay-in")
    val ckptDir = tempDir("cur-replay-ckpt")
    (0 until 4).foreach { i =>
      graft.ark.Ark.writeSingleFile(
        docs.filter(col("doc_id") % 4 === i), s"$inDir/slice$i.parquet")
    }
    val none = docs.filter(lit(false))
    val keyed = CurationStore.build(none, "doc_id", "text",
      tempDir("cur-replay-keyed"))
    val unkeyed = CurationStore.build(none, "doc_id", "text",
      tempDir("cur-replay-unkeyed"))

    // fire once, AFTER epoch 1's updates fully committed (swap done,
    // in-flight marker gone) but before foreachBatch returns — the
    // restart replays epoch 1 with the same id
    val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): Unit =
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inDir)
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[
             org.apache.spark.sql.Row], epochId: Long) =>
            CurationStore.update(keyed, batch.toDF(), "text",
              batchId = Some(s"epoch-$epochId"))
            CurationStore.update(unkeyed, batch.toDF(), "text")
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

    val rebuilt = CurationStore.build(docs, "doc_id", "text",
      tempDir("cur-replay-rebuild"))
    // keyed store: every stage equals the batch build — the q126
    // identity held through real micro-batching AND a replayed epoch
    assert(stage(keyed.signatures(spark))
      == stage(rebuilt.signatures(spark)), "signatures")
    assert(stage(keyed.pairs(spark)) == stage(rebuilt.pairs(spark)),
      "pairs")
    assert(stage(keyed.labels(spark)) == stage(rebuilt.labels(spark)),
      "labels")
    // unkeyed store: the replayed epoch re-appended its signature
    // rows — the window is real, the key closes it
    assert(unkeyed.signatures(spark).count()
      > rebuilt.signatures(spark).count())
  }
}
