package graft

import org.apache.spark.sql.functions._

/** Incremental-maintenance evidence generator (dev-run,
  * `tier:"incremental"` lines in SCALING.jsonl; prose in SCALING.md).
  *
  * The claim under test is the 100 TB maintenance story of
  * [[ops.CurationStore.update]]: folding a FIXED-SIZE daily batch
  * into a staged store costs O(batch + touched clusters) — the
  * history TEXT is never re-read — while the full rebuild it
  * replaces re-shingles the whole corpus. Measured, not argued: at
  * each corpus size (documents at sf0.01 = 500 docs, sf0.1 = 5 000)
  * the corpus is split into history (all but the 100 highest
  * doc_ids) and a 100-doc batch, and three operations run under a
  * task-metrics listener:
  *
  *  - `build_history`  — store build over the history slice (also
  *    the JIT/codegen warm-up for the shared kernels),
  *  - `update_batch100` — the incremental fold of the fixed batch
  *    (measured ONCE, cold: update appends to the store, so a warm
  *    pass would violate its disjoint-id contract),
  *  - `rebuild_full`   — the full build `update` replaces.
  *
  * The evidence is the GROWTH SHAPE between the two corpus sizes:
  * rebuild input/shuffle records grow with the corpus (~10×), the
  * update's text-side input is the batch alone both times, and its
  * corpus-proportional terms are narrow columnar signature/label
  * rows — the asymptote a 1000-executor run cares about. Rows are
  * single measurements on a shared dev box; ratios, not absolute
  * seconds, are the stable signal (see BENCH_NOTES on ambient
  * spread).
  */
object IncrementalScaling {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)
    val out = new StringBuilder

    def measure(sf: String, name: String, extra: Map[String, Any])(
        run: => Long): Unit = {
      // warm = false: the run mutates store state (see measured())
      val (result, sec) =
        ScalingLog.measured(spark, listener, warm = false)(run)
      val line = ScalingLog.caseLine("incremental", sf, name, result,
        ScalingLog.countersOf(listener), sec, extra)
      println(s"[inc] $line")
      out.append(line).append('\n')
    }

    for (sf <- Seq("sf0.01", "sf0.1")) {
      val docs = spark.read
        .parquet(s"/root/testdata/$sf/documents.parquet")
        .select("doc_id", "text")
      // fixed 100-doc batch = the 100 highest doc_ids; history = rest
      val cut = docs.orderBy(col("doc_id").desc).limit(100)
        .agg(min("doc_id")).head().getLong(0)
      val history = docs.filter(col("doc_id") < cut)
      val batch = docs.filter(col("doc_id") >= cut)
      val nHist = history.count()
      val root = s"target/incscaling/$sf"
      val histDir = s"$root/store"
      val fullDir = s"$root/rebuild"
      for (d <- Seq(histDir, fullDir)) {
        val p = new org.apache.hadoop.fs.Path(d)
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        fs.delete(p, true)
      }

      var store: ops.CurationStore.Store = null
      measure(sf, "build_history", Map("docs" -> nHist)) {
        store = ops.CurationStore.build(
          history, "doc_id", "text", histDir)
        store.labels(spark).count()
      }
      // admission-control read BEFORE the fold — the daily gate's
      // own cost shape: the batch signs locally and BROADCASTS its
      // band rows (the executed plan builds the batch side of every
      // LSH join), so shuffle stays batch-sized at both corpus
      // sizes while the corpus-proportional input is the NARROW
      // signature stage alone — history text never enters the scan
      measure(sf, "screen_batch100", Map("batch" -> 100)) {
        ops.CurationStore.screen(spark, store, batch, "text")
          .filter(col("status") === "kept").count()
      }
      measure(sf, "update_batch100", Map("batch" -> 100)) {
        ops.CurationStore.update(store, batch, "text")
        store.labels(spark).count()
      }
      measure(sf, "rebuild_full", Map("docs" -> (nHist + 100))) {
        ops.CurationStore.build(docs, "doc_id", "text", fullDir)
          .labels(spark).count()
      }

      // the same three measurements for the stats store: its update
      // law is cheaper still (per-source merge of broadcast-sized
      // rows; the only corpus-sized pass is the batch's own token
      // explode), so its rebuild-vs-update gap is the purest form of
      // the never-rescan-history claim. result = sum of per-source
      // doc counters (equality across update and rebuild is the law)
      val docsAll = spark.read
        .parquet(s"/root/testdata/$sf/documents.parquet")
        .select("doc_id", "text", "source")
      val histS = docsAll.filter(col("doc_id") < cut)
      val batchS = docsAll.filter(col("doc_id") >= cut)
      var stats: ops.StatsStore.Store = null
      measure(sf, "stats_build_history", Map("docs" -> nHist)) {
        stats = ops.StatsStore.build(histS, "text", "source",
          s"$root/stats-store")
        stats.stats(spark).agg(sum("docs")).head().getLong(0)
      }
      measure(sf, "stats_update_batch100", Map("batch" -> 100)) {
        ops.StatsStore.update(stats, batchS, "text", "source")
        stats.stats(spark).agg(sum("docs")).head().getLong(0)
      }
      measure(sf, "stats_rebuild_full", Map("docs" -> (nHist + 100))) {
        ops.StatsStore.build(docsAll, "text", "source",
            s"$root/stats-rebuild")
          .stats(spark).agg(sum("docs")).head().getLong(0)
      }
    }

    ScalingLog.replaceSlice(ScalingLog.tier("incremental"), out.toString)
    println("[inc] SCALING.jsonl incremental tier replaced")
    spark.stop()
  }
}
