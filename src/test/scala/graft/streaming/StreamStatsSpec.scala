package graft.streaming

import graft.SparkSpec
import graft.ops.StatsStore
import graft.queries.StreamQueries
import org.apache.spark.sql.functions._

/** The streaming stats-store maintenance loop (q131): after the
  * corpus has arrived as four disjoint micro-batches, each folded in
  * by `foreachBatch` → StatsStore.update, the store must equal a
  * from-scratch batch rebuild at every field's guarantee — the
  * pairwise update law of StatsStoreSpec, compounded over a real
  * multi-batch streaming execution (different batch boundaries,
  * different arrival order, a fresh swap per batch).
  */
class StreamStatsSpec extends SparkSpec {

  private def tempDir(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def exactFields(st: StatsStore.Store) =
    st.report(spark)
      .select("source", "docs", "token_occurrences",
        "distinct_tokens_est", "distinct_fp_est")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  test("crash-replay after a committed batch: batchId makes the " +
      "replayed epoch a no-op; without it the replay double-counts") {
    import org.apache.spark.sql.streaming.Trigger
    val docs = sf("documents")
    val inDir = tempDir("replay-in")
    val ckptDir = tempDir("replay-ckpt")
    val keyedDir = tempDir("replay-keyed")
    val unkeyedDir = tempDir("replay-unkeyed")
    (0 until 4).foreach { i =>
      graft.ark.Ark.writeSingleFile(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 4
          === i), s"$inDir/slice$i.parquet")
    }
    val keyed = StatsStore.build(
      docs.filter(org.apache.spark.sql.functions.lit(false)),
      "text", "source", keyedDir)
    val unkeyed = StatsStore.build(
      docs.filter(org.apache.spark.sql.functions.lit(false)),
      "text", "source", unkeyedDir)

    // the bomb fires ONCE, after epoch 1's updates fully returned
    // (store swap committed, in-flight marker deleted) but before
    // foreachBatch returns — so the streaming checkpoint never
    // acknowledges the epoch and the restart REPLAYS it with the
    // same id: the exact committed-but-unacknowledged window the
    // _applied record exists to close
    val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): Unit =
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inDir)
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[
             org.apache.spark.sql.Row], epochId: Long) =>
            StatsStore.update(keyed, batch.toDF(), "text", "source",
              batchId = Some(epochId.toString))
            StatsStore.update(unkeyed, batch.toDF(), "text", "source")
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

    val rebuilt = StatsStore.build(docs, "text", "source",
      tempDir("replay-rebuild"))
    // keyed store: the replayed epoch was detected as already
    // applied — every exact field equals the batch rebuild
    assert(exactFields(keyed) == exactFields(rebuilt))
    // unkeyed store: the replay re-folded epoch 1 — the additive
    // counters double-count it (the window is real, the key closes it)
    val totalDocs = (st: StatsStore.Store) =>
      exactFields(st).values.map(_._1).sum
    assert(totalDocs(unkeyed) > totalDocs(rebuilt))
  }

  test("stream-maintained store == batch rebuild, to each field's guarantee") {
    val docs = sf("documents")
    val streamed = StreamQueries.streamStatsStore(
      spark, "/root/testdata/sf0.001", tempDir("stream-stats"))
    val rebuilt = StatsStore.build(docs, "text", "source",
      tempDir("stream-stats-rebuild"))

    // counters are additive, HLL union is a register-wise max, theta
    // union in exact mode is exact set union: all three must be
    // EXACTLY equal however the corpus was batched
    assert(exactFields(streamed) == exactFields(rebuilt))

    // the randomized KLL is equivalent in guarantee, not value: bound
    // the streamed store's quantiles against exact per-source ranks
    val lens = docs.select(col("source"),
        length(col("text")).cast("long").as("l"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def rankOf(xs: Seq[Long], v: Long): Double =
      xs.count(_ <= v).toDouble / xs.size
    streamed.report(spark).select("source", "p50_len", "p95_len")
      .collect().foreach { r =>
        val (src, p50, p95) = (r.getString(0), r.getLong(1), r.getLong(2))
        assert(rankOf(lens(src), p50) >= 0.40 &&
          rankOf(lens(src), p50 - 1) <= 0.60,
          s"$src: streamed p50=$p50 rank ${rankOf(lens(src), p50)}")
        assert(rankOf(lens(src), p95) >= 0.90,
          s"$src: streamed p95=$p95")
      }
  }
}
