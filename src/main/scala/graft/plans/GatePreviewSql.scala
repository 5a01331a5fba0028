package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, LongType, StringType}

/** SQL surface for the FULL three-axis admission gate, READ-ONLY —
  * the decision frame [[graft.ops.CorpusStore.ingestScreenedAttributed]]
  * acts on (lexical near-dup with `dup_of` receipts, benchmark
  * decontamination with `bench_rev` provenance, semantic near-dup
  * with `adc`), WITHOUT folding a row, recording a batch pin, or
  * appending to the gate log. `dedup_screen` (q198) opened the
  * lexical axis to SQL; this door opens the composed gate — the
  * what-would-the-gate-do query a crawler operator runs before
  * committing a batch id:
  *
  * {{{
  *   CREATE TEMP VIEW crawl AS
  *     SELECT doc_id, text, embedding FROM staging_batch;
  *   SELECT doc_id, status, dup_of, adc
  *   FROM gate_preview('/stores/corpus', 'doc_id', 'crawl',
  *                     'text', 'embedding', 0.9, 2)
  *   WHERE status != 'kept'
  * }}}
  *
  * Arguments: the corpus-store ROOT directory (the quad's parent —
  * [[graft.ops.CorpusStore.forDir]] reopens the tiers), the shared
  * id column name, the BATCH relation as a view/table name (the
  * batch is itself a relation, so it arrives by name — the standing
  * TVF convention), the view's text and embedding column names, the
  * semantic gate's τ (ADC units — the q197 calibration's dial) and
  * `nprobe`. An optional 8th argument names a versioned
  * [[graft.ops.BenchmarkStore]] directory and adds the
  * decontamination axis against its LIVE revision (stamped
  * `bench_rev`). Banding comes from the curation tier's own
  * persisted dials — like `dedup_screen`, this door deliberately
  * exposes no banding arguments, so a SQL consumer can never screen
  * a store under criteria other than its own. Because no pin is
  * recorded, two previews straddling a benchmark revision may see
  * different revisions — the committed gate's determinism contract
  * starts at `ingestScreened`'s batchId.
  */
object GatePreviewSql {

  private def strArg(e: Expression, fn: String, what: String): String = {
    require(e.foldable && e.dataType == StringType,
      s"$fn: $what must be a string literal")
    val v = e.eval()
    require(v != null, s"$fn: $what must not be NULL")
    v.toString
  }

  private def doubleArg(e: Expression, fn: String,
      what: String): Double = {
    require(e.foldable && (e.dataType == DoubleType ||
        e.dataType == FloatType || e.dataType == IntegerType ||
        e.dataType == LongType ||
        e.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]),
      s"$fn: $what must be a numeric literal")
    val v = e.eval()
    require(v != null, s"$fn: $what must not be NULL")
    v.toString.toDouble
  }

  private def intArg(e: Expression, fn: String, what: String): Int = {
    require(e.foldable &&
        (e.dataType == IntegerType || e.dataType == LongType),
      s"$fn: $what must be an integer literal")
    val v = e.eval()
    require(v != null, s"$fn: $what must not be NULL")
    val n = v.toString.toLong
    require(n >= Int.MinValue && n <= Int.MaxValue,
      s"$fn: $what out of int range ($n)")
    n.toInt
  }

  /** `gate_preview(storeDir, idCol, batchView, textCol, vecCol,
    * tau, nprobe[, benchStoreDir])` → (idCol, status, dup_of, adc[,
    * bench_rev]) per batch row. */
  def build(args: Seq[Expression]): LogicalPlan = {
    val fn = "gate_preview"
    require(args.length == 7 || args.length == 8,
      s"$fn(storeDir, idCol, batchView, textCol, vecCol, tau, " +
        "nprobe[, benchStoreDir]) takes 7 or 8 arguments")
    val dir = strArg(args(0), fn, "corpus store directory")
    val idCol = strArg(args(1), fn, "id column name")
    val view = strArg(args(2), fn, "batch view name")
    val textCol = strArg(args(3), fn, "text column name")
    val vecCol = strArg(args(4), fn, "embedding column name")
    val tau = doubleArg(args(5), fn, "tau")
    val nprobe = intArg(args(6), fn, "nprobe")
    val bench =
      if (args.length < 8) None
      else Some(graft.ops.BenchmarkStore.Store(
        strArg(args(7), fn, "benchmark store directory")))
    val s = SparkSession.active
    graft.ops.CorpusStore.gatePreview(
        graft.ops.CorpusStore.forDir(s, dir, idCol),
        s.table(view), textCol, vecCol,
        semanticTau = Some(tau), semanticNprobe = nprobe,
        benchmarkStore = bench)
      .queryExecution.logical
  }
}
