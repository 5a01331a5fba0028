package graft

import org.apache.spark.sql.functions._

/** Time-travel / rollback cost evidence generator (dev-run,
  * `tier:"snapshot"` lines in SCALING.jsonl; prose in SCALING.md).
  *
  * Two claims under test, from [[ops.StoreVersions]]' scaladoc:
  *
  *  1. a TIME-TRAVEL read ([[ops.TextIndexStore.Index.pinAt]]) costs
  *     what the same read cost LIVE at that epoch — the pin is one
  *     snapshot-file read and the scan reads the pinned file
  *     manifest, no amplification: `read_live_epoch0` vs
  *     `read_pinned_epoch0` must show the same input_records at each
  *     SF (the two scans read the same bytes);
  *  2. a ROLLBACK costs the UNDONE BATCH, not the corpus — the files
  *     folded since the target epoch are deleted surgically off the
  *     snapshot's manifest (plus metadata listings); with the batch
  *     size FIXED (100 docs) across the 10× SF step, `rollback` runs zero
  *     corpus-sized jobs (input_records at the floor) and its
  *     seconds stay flat while the store grows 10×.
  *
  * The generator builds a text store per SF (setup, unmeasured),
  * reads the build epoch live, folds a FIXED 100-doc batch, reads
  * the build epoch again through the pin (the store has moved on —
  * only the manifest serves that epoch now), rolls the batch back,
  * and proves restore-exactness with a row-count equality.
  */
object SnapshotScaling {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)
    val out = new StringBuilder
    val terms = Seq("join", "vector", "stream")

    def measure(sf: String, name: String, extra: Map[String, Any],
        warm: Boolean = true)(run: => Long): Unit = {
      val (result, sec) = ScalingLog.measured(spark, listener,
        warm)(run)
      val line = ScalingLog.caseLine("snapshot", sf, name, result,
        ScalingLog.countersOf(listener), sec, extra)
      println(s"[snapshot] $line")
      out.append(line).append('\n')
    }

    for (sf <- Seq("sf0.01", "sf0.1")) {
      val docs = spark.read
        .parquet(s"/root/testdata/$sf/documents.parquet")
        .select("doc_id", "text")
      val nDocs = docs.count()
      val dir = s"target/snapscaling/$sf/text"
      // a fresh dir per run: deterministic snapshot numbering
      val dirP = new org.apache.hadoop.fs.Path(dir)
      val fs0 = dirP.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs0.exists(dirP)) fs0.delete(dirP, true)
      // setup (unmeasured): the store at this SF, and the fixed
      // batch every SF folds (the same 100 documents, shifted ids —
      // rollback cost must track THIS, not nDocs)
      val st = ops.TextIndexStore.build(docs, "doc_id", "text", dir)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val seq0 = ops.StoreVersions.snapshots(fs, dir).last._1
      val batch = docs.filter(col("doc_id") < 100)
        .withColumn("doc_id", col("doc_id") + 10000000L)

      measure(sf, "read_live_epoch0", Map("docs" -> nDocs)) {
        ops.TextIndexStore.bm25(spark, st, terms).count()
      }
      ops.TextIndexStore.update(st, batch, "text",
        batchId = Some(s"snap-scale-$sf"))
      measure(sf, "read_pinned_epoch0", Map("docs" -> nDocs)) {
        ops.TextIndexStore.bm25Of(spark, st.pinAt(spark, seq0), terms)
          .count()
      }
      // warm = false: a rollback is side-effectful (the warm-up run
      // would consume the batch the measured run is meant to undo)
      measure(sf, "rollback_batch100", Map("docs" -> nDocs,
          "batch_docs" -> 100), warm = false) {
        ops.TextIndexStore.rollback(spark, st, seq0)
        0L
      }
      // restore-exactness witness (unmeasured): the rolled-back
      // store serves the build epoch's row set again
      val n0 = ops.TextIndexStore.bm25(spark, st, terms).count()
      require(n0 == ops.TextIndexStore.bm25Of(spark,
          st.pinAt(spark, ops.StoreVersions.snapshots(fs, dir)
            .last._1), terms).count(),
        "rollback did not restore the epoch")
    }

    ScalingLog.replaceSlice(ScalingLog.tier("snapshot"), out.toString)
    println("[snapshot] SCALING.jsonl snapshot tier replaced")
    spark.stop()
  }
}
