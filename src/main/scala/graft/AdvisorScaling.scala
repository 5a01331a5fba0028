package graft

import org.apache.spark.sql.functions._

/** Maintenance-advisor cost evidence generator (dev-run,
  * `tier:"advisor"` lines in SCALING.jsonl; prose in SCALING.md).
  *
  * The claim under test is [[ops.Advisor]]'s scaladoc: every metric
  * is a file-listing or one-row read, so the advisor can run after
  * every batch AT ANY SCALE — its cost must be independent of corpus
  * size. Measured, not argued: a four-store [[ops.CorpusStore]] quad
  * is built at each SF (setup, not measured), a takedown plants
  * signals in all four stores, and the `advise_quad` case measures
  * ONLY the advise call over the whole quad. The evidence is
  * input_records staying at the one-row-stats/monitoring-row floor
  * (tens of rows — the stats tier's one row per source dominates)
  * and flat across the 10× SF step while the advised corpora grow
  * 10×; shuffle stays at the tiny toDF frame's footprint.
  */
object AdvisorScaling {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)
    val out = new StringBuilder

    def measure(sf: String, name: String, extra: Map[String, Any])(
        run: => Long): Unit = {
      val (result, sec) = ScalingLog.measured(spark, listener)(run)
      val line = ScalingLog.caseLine("advisor", sf, name, result,
        ScalingLog.countersOf(listener), sec, extra)
      println(s"[advisor] $line")
      out.append(line).append('\n')
    }

    for (sf <- Seq("sf0.01", "sf0.1")) {
      val docs = spark.read
        .parquet(s"/root/testdata/$sf/documents.parquet")
      val emb = spark.read
        .parquet(s"/root/testdata/$sf/embeddings.parquet")
      val corpus = docs.join(emb, docs("doc_id") === emb("vec_id"))
        .select(docs("doc_id"), col("text"), col("source"),
          col("embedding"))
      val nDocs = corpus.count()
      val c = ops.AnnIndexStore.CorpusDials
      val dials = ops.AnnIndexStore.Dials(col("doc_id") % 50 === 7,
        col("doc_id") % 10 === 3, c.m, c.subDim, c.iters)
      // setup (unmeasured): the quad plus a takedown so every store
      // carries a live maintenance signal for the advisor to read
      val st = ops.CorpusStore.build(corpus, "doc_id", "text",
        "embedding", s"target/advisorscaling/$sf/quad",
        annDials = Some(dials), sourceCol = Some("source"))
      val doomed = corpus.filter(col("doc_id") % 10 === 6)
      ops.CorpusStore.delete(st, doomed.select("doc_id"),
        s"adv-scale-$sf", Some(doomed))

      measure(sf, "advise_quad", Map("docs" -> nDocs)) {
        ops.Advisor.advise(spark, st).count()
      }
    }

    ScalingLog.replaceSlice(ScalingLog.tier("advisor"), out.toString)
    println("[advisor] SCALING.jsonl advisor tier replaced")
    spark.stop()
  }
}
