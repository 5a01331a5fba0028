package graft

import org.apache.spark.sql.functions._

/** Store-clone cost evidence generator (dev-run, `tier:"clone"`
  * lines in SCALING.jsonl; prose in SCALING.md).
  *
  * Two claims under test, from [[ops.StoreVersions.cloneAt]]'s
  * scaladoc:
  *
  *  1. a clone is a FILE COPY, not a computation: `clone_at_epoch`
  *     runs ZERO Spark jobs (input/shuffle records at the floor) and
  *     its seconds track the snapshot's bytes — the byte size rides
  *     the line (`bytes`), measured off the snapshot's own file
  *     manifests BEFORE the copy;
  *  2. the clone serves its epoch at the SAME cost the source's
  *     historical pin pays: `serve_clone` vs `serve_source_pinned`
  *     must show the same input_records at each SF (the clone's
  *     live manifest names byte-identical copies of exactly the
  *     files the pin reads).
  *
  * Setup per SF (unmeasured): build a text store on two thirds of
  * the documents corpus, capture the build epoch, fold the last
  * third in — so the cloned epoch is strictly smaller than the live
  * store and a leaked post-epoch file would show up as an
  * input_records excess on `serve_clone`.
  */
object CloneScaling {

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
      val line = ScalingLog.caseLine("clone", sf, name, result,
        ScalingLog.countersOf(listener), sec, extra)
      println(s"[clone] $line")
      out.append(line).append('\n')
    }

    for (sf <- Seq("sf0.01", "sf0.1")) {
      val docs = spark.read
        .parquet(s"/root/testdata/$sf/documents.parquet")
        .select("doc_id", "text")
      val nDocs = docs.count()
      val dir = s"target/clonescaling/$sf/src"
      val dst = s"target/clonescaling/$sf/dst"
      val conf = spark.sessionState.newHadoopConf()
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
      Seq(dir, dst).foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        if (fs.exists(p)) fs.delete(p, true)
      }
      val st = ops.TextIndexStore.build(
        docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text", dir)
      val seq0 = ops.StoreVersions.snapshots(fs, dir).last._1
      ops.TextIndexStore.update(st,
        docs.filter(col("doc_id") % 3 === 0), "text",
        batchId = Some(s"clone-scale-$sf"))
      // the snapshot's byte size, off its own manifests (append
      // stages) + the replace stage's version listing — known BEFORE
      // the copy, so it can ride the measured line
      val snapState = ops.StoreVersions.readAt(fs, dir, seq0)
      val appendBytes = snapState.files.values.flatten.map(_._2).sum
      val statsBytes = fs.listStatus(new org.apache.hadoop.fs.Path(
          s"$dir/stats/${snapState.versions("stats")}"))
        .filter(_.isFile).map(_.getLen).sum
      // warm = false: a clone is side-effectful (the destination
      // must not exist)
      measure(sf, "clone_at_epoch", Map("docs" -> nDocs,
          "bytes" -> (appendBytes + statsBytes)), warm = false) {
        ops.TextIndexStore.cloneAt(spark, st, seq0, dst)
        ops.UpdateMarker.listFilesRecursive(fs, dst).size.toLong
      }
      val clone = ops.TextIndexStore.Index(dst, "doc_id")
      measure(sf, "serve_clone", Map("docs" -> nDocs)) {
        ops.TextIndexStore.bm25(spark, clone, terms).count()
      }
      measure(sf, "serve_source_pinned", Map("docs" -> nDocs)) {
        ops.TextIndexStore.bm25Of(spark, st.pinAt(spark, seq0), terms)
          .count()
      }
      // epoch-exactness witness (unmeasured): identical row sets
      require(ops.TextIndexStore.bm25(spark, clone, terms)
          .exceptAll(ops.TextIndexStore.bm25Of(spark,
            st.pinAt(spark, seq0), terms)).isEmpty,
        "clone serve drifted from the pinned epoch")
    }

    ScalingLog.replaceSlice(ScalingLog.tier("clone"), out.toString)
    println("[clone] SCALING.jsonl clone tier replaced")
    spark.stop()
  }
}
