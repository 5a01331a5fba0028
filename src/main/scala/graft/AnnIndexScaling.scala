package graft

import org.apache.spark.sql.functions._

/** Maintenance-scaling evidence for the persisted ANN index
  * (dev-run, `tier:"ann_index"` lines in SCALING.jsonl; prose in
  * SCALING.md) — the [[IncrementalScaling]] discipline applied to
  * [[ops.AnnIndexStore]].
  *
  * The 100 TB claim under test: folding a FIXED-SIZE vector batch in
  * ([[ops.AnnIndexStore.add]]) costs O(batch) — the stored models
  * broadcast, the history vectors are never re-read and the trainers
  * never re-run — while the full rebuild it replaces re-trains and
  * re-encodes the whole corpus; and [[ops.AnnIndexStore.compact]]'s
  * periodic rewrite touches only the NARROW coded rows (a few longs
  * per vector), never the raw vectors. At each corpus size
  * (embeddings at sf0.01 = 500, sf0.1 = 2 000 vectors) four
  * operations run under the task-metrics listener:
  *
  *  - `build_history`  — index build over all but the 100 highest
  *    vec_ids (also the JIT warm-up for the shared kernels),
  *  - `add_batch100`   — the incremental fold of the fixed batch
  *    (cold by contract: add appends, a warm pass would violate the
  *    disjoint-id contract),
  *  - `compact`        — the small-file fold-down over the coded
  *    table,
  *  - `rebuild_full`   — the full build `add` replaces.
  *
  * The signal is the GROWTH SHAPE between the corpus sizes: rebuild
  * input/shuffle grows with the corpus, add's vector-side input is
  * the batch both times (its corpus term is the tiny model tables),
  * compact grows with the corpus but over rows ~20× narrower than
  * the embeddings. Single measurements on a shared dev box — ratios,
  * not absolute seconds, are the stable signal.
  */
object AnnIndexScaling {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)
    val out = new StringBuilder

    // every case mutates store state (warm = false), and every
    // case's VERIFICATION count runs AFTER the measurement window —
    // a count() scans the (corpus-sized, however narrow) codes table
    // and would mis-attribute that read to the maintenance operation
    // being measured
    def measure(sf: String, name: String, extra: Map[String, Any])(
        run: => Unit)(verify: => Long): Unit = {
      val (_, sec) =
        ScalingLog.measured(spark, listener, warm = false) { run; 0L }
      // snapshot the window's counters BEFORE the verification scan
      val counters = ScalingLog.countersOf(listener)
      val line = ScalingLog.caseLine("ann_index", sf, name, verify,
        counters, sec, extra)
      println(s"[annidx] $line")
      out.append(line).append('\n')
    }

    // the ONE dials definition the store itself builds with — the
    // evidence must describe the index the store serves
    val d = ops.AnnIndexStore.CorpusDials
    val (cp, sp, m, sub, it) =
      (d.centroidPred, d.seedPred, d.m, d.subDim, d.iters)
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val emb = spark.read
        .parquet(s"/root/testdata/$sf/embeddings.parquet")
        .select("vec_id", "embedding")
      val cut = emb.orderBy(col("vec_id").desc).limit(100)
        .agg(min("vec_id")).head().getLong(0)
      val history = emb.filter(col("vec_id") < cut)
      val batch = emb.filter(col("vec_id") >= cut)
      val nHist = history.count()
      val root = s"target/annidxscaling/$sf"
      for (d <- Seq(s"$root/store", s"$root/rebuild")) {
        val p = new org.apache.hadoop.fs.Path(d)
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        fs.delete(p, true)
      }

      var idx: ops.AnnIndexStore.Index = null
      measure(sf, "build_history", Map("vecs" -> nHist)) {
        idx = ops.AnnIndexStore.build(history, "vec_id", "embedding",
          s"$root/store", cp, sp, m, sub, it)
      }(idx.codes(spark).count())
      // semantic admission gate BEFORE the fold — the q194 shape:
      // the batch's ids ride a broadcast DENY anti-join on the
      // pruned candidates ([[ops.AnnIndexStore.searchExcluding]]),
      // so shuffle stays batch-sized at both corpus sizes and the
      // corpus-proportional input is the probed cells' coded rows
      // alone — never a corpus-minus-batch complement
      measure(sf, "semantic_batch100", Map("batch" -> 100)) {
        ops.AnnIndexStore.semanticDups(spark, idx, batch, "vec_id",
          "embedding", tau = 0.9, nprobe = 2)
          .filter(col("flagged")).count()
        ()
      }(batch.count())
      measure(sf, "add_batch100", Map("batch" -> 100)) {
        ops.AnnIndexStore.add(idx, batch, "embedding")
      } {
        val n = idx.codes(spark).count()
        require(n == nHist + 100, "add did not land the batch")
        n
      }
      measure(sf, "compact", Map("vecs" -> (nHist + 100))) {
        ops.AnnIndexStore.compact(spark, idx)
      }(idx.codes(spark).count())
      // staleness probe: |sample| × corpus brute-force yardstick +
      // one stored-index serve — the documented probe-cadence cost
      // (grows with the corpus, which is why it runs on a sample at
      // monitoring cadence, never per query)
      val probeQ = emb.filter(col("vec_id") % 100 === 3)
        .select(col("vec_id").as("qid"), col("embedding"))
      measure(sf, "recall_probe", Map("vecs" -> (nHist + 100))) {
        ops.AnnIndexStore.recallProbe(spark, idx, emb, probeQ,
          "qid", "embedding", k = 10).collect()
      }(probeQ.count())
      // two-stage serve: ADC shortlist + exact re-rank — the
      // corpus-side cost is ONE scan joined against the broadcast
      // shortlist, so growth tracks the corpus scan, not a shuffle
      measure(sf, "refine_serve", Map("shortlist" -> 50)) {
        ops.AnnIndexStore.searchRefined(spark, idx, emb, probeQ,
          "qid", "embedding", k = 10, shortlist = 50).collect()
      }(probeQ.count())
      // deletion: tombstone append — O(batch), corpus untouched
      measure(sf, "delete_batch100", Map("batch" -> 100)) {
        ops.AnnIndexStore.delete(idx,
          batch.select("vec_id"), batchId = Some(s"del-$sf"))
      } {
        val n = idx.codes(spark).count()
        require(n == nHist, "delete did not mask the batch")
        n
      }
      var rebuilt: ops.AnnIndexStore.Index = null
      measure(sf, "rebuild_full", Map("vecs" -> (nHist + 100))) {
        rebuilt = ops.AnnIndexStore.build(emb, "vec_id", "embedding",
          s"$root/rebuild", cp, sp, m, sub, it)
      }(rebuilt.codes(spark).count())
    }

    ScalingLog.replaceSlice(ScalingLog.tier("ann_index"), out.toString)
    println("[annidx] SCALING.jsonl ann_index tier replaced")
    spark.stop()
  }
}
