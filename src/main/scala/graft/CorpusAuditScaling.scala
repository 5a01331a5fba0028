package graft

import org.apache.spark.sql.functions._

/** Corpus-audit cost evidence generator (dev-run,
  * `tier:"corpus_audit"` lines in SCALING.jsonl; prose in
  * SCALING.md). Two claims under test, both from
  * [[ops.CorpusStore]]'s scaladocs:
  *
  *  - [[ops.CorpusStore.retroContamination]] — the eval side
  *    broadcasts (token set, then shingle set); the corpus side is
  *    ONE linear positional-postings pass for the candidate
  *    pre-filter, and only the CANDIDATES pay the per-doc position
  *    window. So with a FIXED eval set, the audit's input grows
  *    linearly with the corpus while its shuffle stays
  *    candidate-sized — the `retro_audit` case measures exactly the
  *    audit call at two corpus sizes under the same 5-doc eval
  *    revision.
  *  - [[ops.CorpusStore.membershipDiff]] — membership-only: two
  *    pinned doclens scans plus two anti-joins; input is ~2× the
  *    membership rows and INDEPENDENT of text/postings bytes
  *    (`member_diff` case, same two corpus sizes, spanning one
  *    ingest + one takedown).
  */
object CorpusAuditScaling {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)
    val out = new StringBuilder

    def measure(sf: String, name: String, extra: Map[String, Any])(
        run: => Long): Unit = {
      val (result, sec) = ScalingLog.measured(spark, listener)(run)
      val line = ScalingLog.caseLine("corpus_audit", sf, name, result,
        ScalingLog.countersOf(listener), sec, extra)
      println(s"[corpus_audit] $line")
      out.append(line).append('\n')
    }

    val retainKey = ops.StoreVersions.RetainVersions
    spark.conf.set(retainKey, "2")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val docs = spark.read
        .parquet(s"/root/testdata/$sf/documents.parquet")
      val emb = spark.read
        .parquet(s"/root/testdata/$sf/embeddings.parquet")
      val corpus = docs.join(emb, docs("doc_id") === emb("vec_id"))
        .select(docs("doc_id"), col("text"), col("embedding"))
      val base = corpus.filter(col("doc_id") % 2 === 0)
      val nBase = base.count()
      val c = ops.AnnIndexStore.CorpusDials
      val dials = ops.AnnIndexStore.Dials(col("doc_id") % 50 === 8,
        col("doc_id") % 10 === 4, c.m, c.subDim, c.iters)
      // setup (unmeasured): the quad on the even half, plus a
      // versioned eval store pinned to a FIXED-SIZE revision (first
      // 5 docs of the stored %100==6 slice — stored docs, the
      // sharpest retro case) so the eval side is constant across
      // the corpus step
      val root = s"target/auditscaling/$sf"
      val st = ops.CorpusStore.build(base, "doc_id", "text",
        "embedding", s"$root/quad", annDials = Some(dials))
      val fs = new org.apache.hadoop.fs.Path(s"$root/eval")
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/eval"), true)
      val bs = ops.BenchmarkStore.build(
        docs.filter(col("doc_id") % 100 === 6)
          .orderBy("doc_id").limit(5)
          .select(col("doc_id"), col("text")),
        "doc_id", "text", s"$root/eval")

      measure(sf, "retro_audit", Map("docs" -> nBase)) {
        ops.CorpusStore.retroContamination(spark, st, bs, 2).count()
      }

      // setup (unmeasured): one ingest + one takedown span the diff
      val e0 = ops.CorpusStore.snapshotSeqs(spark, st)
      ops.CorpusStore.ingest(st,
        corpus.filter(col("doc_id") % 2 === 1), "text", "embedding",
        s"audit-scale-b-$sf")
      ops.CorpusStore.delete(st,
        corpus.filter(col("doc_id") % 10 === 6).select("doc_id"),
        s"audit-scale-d-$sf")
      val e2 = ops.CorpusStore.snapshotSeqs(spark, st)
      val nAll = corpus.count()

      measure(sf, "member_diff", Map("docs" -> nAll)) {
        ops.CorpusStore.membershipDiff(spark, st, e0, e2).count()
      }
    }

    ScalingLog.replaceSlice(ScalingLog.tier("corpus_audit"),
      out.toString)
    println("[corpus_audit] SCALING.jsonl corpus_audit tier replaced")
    spark.stop()
  }
}
