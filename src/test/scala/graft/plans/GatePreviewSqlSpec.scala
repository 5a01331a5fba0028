package graft.plans

import graft.SparkSpec
import graft.ops.{AnnIndexStore, BenchmarkStore, CorpusStore}
import org.apache.spark.sql.functions._

/** The full three-axis gate's SQL door must be the SAME decision
  * kernel: `gate_preview` row-identical to
  * [[graft.ops.CorpusStore.gatePreview]] (both ride the one
  * `gateDecisions` copy), read-only through SQL exactly as through
  * the DataFrame form, the optional benchmark-store argument adds the
  * decontamination axis with `bench_rev` provenance, and malformed
  * calls are loud.
  */
class GatePreviewSqlSpec extends SparkSpec {

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("gate-preview-sql").toString
  private lazy val corpus = {
    val docs = sf("documents")
    val emb = sf("embeddings")
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(docs("doc_id"), col("text"), col("embedding"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("SQL == DataFrame for the three-axis preview; the SQL door " +
      "is read-only; the benchmark axis mounts from a directory; " +
      "malformed calls are loud") {
    val root = s"$tmp/quad"
    val evenDials = AnnIndexStore.Dials(
      col("doc_id") % 50 === 8, col("doc_id") % 10 === 4,
      m = 2, subDim = 32, iters = 2)
    val st = CorpusStore.build(corpus.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", "embedding", root, annDials = Some(evenDials))
    corpus.filter(col("doc_id") % 2 === 1)
      .createOrReplaceTempView("gate_sql_batch")
    val batch = spark.table("gate_sql_batch")
    val countsBefore = CorpusStore.liveCounts(spark, st)
    val sql = spark.sql(s"SELECT * FROM gate_preview('$root', " +
      "'doc_id', 'gate_sql_batch', 'text', 'embedding', 0.9, 2)")
    assert(rows(sql) == rows(CorpusStore.gatePreview(st, batch,
        "text", "embedding", semanticTau = Some(0.9),
        semanticNprobe = 2)),
      "gate_preview diverged from the DataFrame preview")
    assert(CorpusStore.liveCounts(spark, st) == countsBefore,
      "the SQL preview folded rows into a tier")
    assert(!new java.io.File(s"${st.curation.dir}/gate_log").exists(),
      "the SQL preview appended a gate-log row")
    // statuses are the real mix and filtering composes in SQL
    val statuses = sql.select("status").distinct().collect()
      .map(_.getString(0)).toSet
    assert(statuses.contains("kept") && statuses.size > 1,
      s"fixture not sharp through the SQL door: $statuses")
    // the 8th argument mounts the decontamination axis from the
    // benchmark store's LIVE revision, stamped bench_rev — and still
    // records no batch pin (read-only preview)
    val bs = BenchmarkStore.build(
      sf("documents").filter(col("doc_id") % 100 === 7)
        .select(col("doc_id"), col("text")),
      "doc_id", "text", s"$tmp/eval")
    val withBench = spark.sql(s"SELECT * FROM gate_preview('$root', " +
      "'doc_id', 'gate_sql_batch', 'text', 'embedding', 0.9, 2, " +
      s"'${bs.dir}')")
    assert(rows(withBench) == rows(CorpusStore.gatePreview(st, batch,
        "text", "embedding", semanticTau = Some(0.9),
        semanticNprobe = 2, benchmarkStore = Some(bs))),
      "the benchmark-mounted SQL preview diverged from the DataFrame")
    assert(withBench.columns.contains("bench_rev") &&
      withBench.filter(col("status") === "contaminated").count() > 0,
      "the decontamination axis did not reach the SQL door")
    val gateDir = new java.io.File(s"${bs.dir}/_gate")
    assert(!gateDir.exists() ||
      gateDir.listFiles().forall(_.getName.contains(".tmp-")),
      "the SQL preview recorded a batch pin")
    // malformed calls fail loudly with the function's name
    val e1 = intercept[Exception] {
      spark.sql(s"SELECT * FROM gate_preview('$root', 'doc_id')")
    }
    assert(e1.getMessage.contains("gate_preview"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM gate_preview('$root', 'doc_id', " +
        "'gate_sql_batch', 'text', 'embedding', 'not-a-tau', 2)")
    }
    assert(e2.getMessage.contains("tau"), e2.getMessage)
  }
}
