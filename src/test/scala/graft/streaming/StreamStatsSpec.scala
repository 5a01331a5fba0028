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

  test("stream-maintained store == batch rebuild, to each field's guarantee") {
    val docs = sf("documents")
    val streamed = StreamQueries.streamStatsStore(
      spark, "/root/testdata/sf0.001", tempDir("stream-stats"))
    val rebuilt = StatsStore.build(docs, "text", "source",
      tempDir("stream-stats-rebuild"))

    def exactFields(st: StatsStore.Store) =
      st.report(spark)
        .select("source", "docs", "token_occurrences",
          "distinct_tokens_est", "distinct_fp_est")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap

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
