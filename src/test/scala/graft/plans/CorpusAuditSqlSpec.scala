package graft.plans

import graft.SparkSpec
import graft.ops.{Advisor, AnnIndexStore, BenchmarkStore, CorpusStore, StoreVersions}
import org.apache.spark.sql.functions._

/** The corpus audit readouts' SQL doors must ride the SAME kernels:
  * `retro_audit` row-identical to [[CorpusStore.retroContamination]]
  * (and READ-ONLY — no quarantine receipt, so the advisory stays
  * open), `corpus_epochs` equal to [[CorpusStore.snapshotSeqs]],
  * `corpus_diff` row-identical to [[CorpusStore.membershipDiffAt]]
  * across a capture a pure-SQL consumer took through
  * `corpus_epochs`, and malformed calls loud.
  */
class CorpusAuditSqlSpec extends SparkSpec {

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("corpus-audit-sql").toString
  private lazy val corpus = {
    val docs = sf("documents")
    val emb = sf("embeddings")
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(docs("doc_id"), col("text"), col("embedding"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("retro_audit SQL == DataFrame and is read-only (the advisory " +
      "stays open); corpus_epochs == snapshotSeqs; corpus_diff SQL " +
      "== DataFrame over an epochs-captured span; malformed calls " +
      "are loud") {
    val retainKey = StoreVersions.RetainVersions
    val prev = spark.conf.getOption(retainKey)
    spark.conf.set(retainKey, "2")
    try {
      val root = s"$tmp/quad"
      val evenDials = AnnIndexStore.Dials(
        col("doc_id") % 50 === 8, col("doc_id") % 10 === 4,
        m = 2, subDim = 32, iters = 2)
      val st = CorpusStore.build(
        corpus.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        "embedding", root, annDials = Some(evenDials))
      val bs = BenchmarkStore.build(
        sf("documents").filter(col("doc_id") % 100 === 6)
          .select(col("doc_id"), col("text")),
        "doc_id", "text", s"$tmp/eval")

      // the audit door: same rows as the kernel, read-only
      val sqlAudit = spark.sql(s"SELECT * FROM retro_audit('$root', " +
        s"'doc_id', '${bs.dir}')")
      assert(rows(sqlAudit) ==
        rows(CorpusStore.retroContamination(spark, st, bs, 2)),
        "retro_audit diverged from the DataFrame audit")
      assert(sqlAudit.count() > 0, "fixture not sharp: empty audit")
      // explicit minOverlap tightens it through the same kernel
      assert(rows(spark.sql(s"SELECT * FROM retro_audit('$root', " +
        s"'doc_id', '${bs.dir}', 3)")) ==
        rows(CorpusStore.retroContamination(spark, st, bs, 3)),
        "retro_audit(minOverlap) diverged")
      // READ-ONLY: no quarantine receipt landed, the advisory is
      // still open (the SQL audit observes; only quarantine settles)
      assert(Advisor.adviseRetro(spark, st, bs).select("action")
          .head().getString(0) == "audit",
        "the SQL audit must not settle the retro advisory")

      // a pure-SQL consumer captures the epoch...
      val epochs0 = spark.sql(
        s"SELECT * FROM corpus_epochs('$root', 'doc_id')")
      val e0 = CorpusStore.snapshotSeqs(spark, st)
      assert(rows(epochs0) == Set(s"[curation,${e0.curation}]",
        s"[ann,${e0.ann}]", s"[text,${e0.text}]"),
        s"corpus_epochs diverged from snapshotSeqs: ${rows(epochs0)}")
      val fromSeq = epochs0.filter(col("store") === "text")
        .head().getInt(1)
      // ... batches land ...
      // delete targets %10==4 — EVEN ids, i.e. base members: the
      // span's removals (an odd %10 slice would be batch members
      // added inside the span and net to nothing)
      CorpusStore.ingest(st, corpus.filter(col("doc_id") % 2 === 1),
        "text", "embedding", "sql-b1")
      CorpusStore.delete(st,
        corpus.filter(col("doc_id") % 10 === 4).select("doc_id"),
        "sql-d1")
      val toSeq = spark.sql(
          s"SELECT * FROM corpus_epochs('$root', 'doc_id')")
        .filter(col("store") === "text").head().getInt(1)
      // ... and diffs the span through the door
      val sqlDiff = spark.sql(s"SELECT * FROM corpus_diff('$root', " +
        s"'doc_id', $fromSeq, $toSeq)")
      assert(rows(sqlDiff) ==
        rows(CorpusStore.membershipDiffAt(spark, st, fromSeq, toSeq)),
        "corpus_diff diverged from the DataFrame diff")
      val byChange = sqlDiff.groupBy("change").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byChange("added") ==
        corpus.filter(col("doc_id") % 2 === 1).count(),
        "added side wrong")
      assert(byChange("removed") ==
        corpus.filter(col("doc_id") % 10 === 4).count(),
        "removed side wrong")

      // malformed calls are loud, naming the function
      val e1 = intercept[Exception] {
        spark.sql(s"SELECT * FROM retro_audit('$root')")
      }
      assert(e1.getMessage.contains("retro_audit"), e1.getMessage)
      val e2 = intercept[Exception] {
        spark.sql(s"SELECT * FROM corpus_diff('$root', 'doc_id', " +
          "'x', 2)")
      }
      assert(e2.getMessage.contains("fromSeq"), e2.getMessage)
      val e3 = intercept[Exception] {
        spark.sql("SELECT * FROM corpus_epochs('/nowhere')")
      }
      assert(e3.getMessage.contains("corpus_epochs"), e3.getMessage)
    } finally prev match {
      case Some(v) => spark.conf.set(retainKey, v)
      case None => spark.conf.unset(retainKey)
    }
  }
}
