package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** SQL front doors for the corpus AUDIT readouts — the round's
  * two-front-doors convention (every decision/readout surface a
  * DataFrame pipeline gets, a pure-SQL consumer gets through a TVF
  * riding the SAME kernel) applied to the retro-contamination audit
  * and the membership diff:
  *
  *  - `retro_audit(corpusRoot, idCol, benchStoreDir[, minOverlap])`
  *    → [[graft.ops.CorpusStore.retroContamination]]: every live doc
  *    sharing ≥ minOverlap (default 2) distinct word-k-grams with
  *    the benchmark store's LIVE revision, reconstructed from the
  *    text tier's positional postings — `(idCol, n_overlap,
  *    bench_rev)`. Read-only: no pin, no delete; act on it with
  *    [[graft.ops.CorpusStore.quarantine]] (whose pinned receipt is
  *    what flips [[graft.ops.Advisor.adviseRetro]] to `ok` — the
  *    SQL audit deliberately does NOT, exactly as two previews
  *    straddling a revision may differ).
  *  - `corpus_epochs(corpusRoot, idCol)` → one row per mounted tier
  *    `(store, seq)`: the quad's current snapshot-log positions
  *    ([[graft.ops.CorpusStore.snapshotSeqs]]) — how a pure-SQL
  *    consumer captures an epoch before a batch lands. Listings
  *    only, zero jobs.
  *  - `corpus_diff(corpusRoot, idCol, fromSeq, toSeq)` →
  *    [[graft.ops.CorpusStore.membershipDiffAt]]: which ids entered
  *    (`added`) and left (`removed`) the corpus between two TEXT-tier
  *    seqs (the diff's membership authority — the `text` rows of
  *    `corpus_epochs`), `(idCol, change)`. Historical seqs resolve
  *    while retention holds ([[graft.ops.StoreVersions
  *    .RetainVersions]]) and fail loudly past it.
  *
  * {{{
  *   -- capture before the nightly batch
  *   SELECT seq FROM corpus_epochs('/stores/corpus', 'doc_id')
  *   WHERE store = 'text';
  *   -- ... batches land ...
  *   SELECT * FROM corpus_diff('/stores/corpus', 'doc_id', 3, 7)
  *   WHERE change = 'removed';
  *   SELECT * FROM retro_audit('/stores/corpus', 'doc_id',
  *                             '/stores/eval')
  *   ORDER BY n_overlap DESC
  * }}}
  */
object CorpusAuditSql {

  private def strArg(e: Expression, fn: String, what: String): String = {
    require(e.foldable && e.dataType == StringType,
      s"$fn: $what must be a string literal")
    val v = e.eval()
    require(v != null, s"$fn: $what must not be NULL")
    v.toString
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

  /** `retro_audit(corpusRoot, idCol, benchStoreDir[, minOverlap])` →
    * (idCol, n_overlap, bench_rev) for the flagged live docs. */
  def buildAudit(args: Seq[Expression]): LogicalPlan = {
    val fn = "retro_audit"
    require(args.length == 3 || args.length == 4,
      s"$fn(corpusRoot, idCol, benchStoreDir[, minOverlap]) takes " +
        "3 or 4 arguments")
    val dir = strArg(args(0), fn, "corpus store directory")
    val idCol = strArg(args(1), fn, "id column name")
    val bench = strArg(args(2), fn, "benchmark store directory")
    val minOverlap =
      if (args.length < 4) 2 else intArg(args(3), fn, "minOverlap")
    val s = SparkSession.active
    graft.ops.CorpusStore.retroContamination(s,
        graft.ops.CorpusStore.forDir(s, dir, idCol),
        graft.ops.BenchmarkStore.Store(bench), minOverlap)
      .queryExecution.logical
  }

  /** `corpus_epochs(corpusRoot, idCol)` → (store, seq) per tier. */
  def buildEpochs(args: Seq[Expression]): LogicalPlan = {
    val fn = "corpus_epochs"
    require(args.length == 2,
      s"$fn(corpusRoot, idCol) takes 2 arguments")
    val dir = strArg(args(0), fn, "corpus store directory")
    val idCol = strArg(args(1), fn, "id column name")
    val s = SparkSession.active
    val st = graft.ops.CorpusStore.forDir(s, dir, idCol)
    val e = graft.ops.CorpusStore.snapshotSeqs(s, st)
    import s.implicits._
    (Seq(("curation", e.curation), ("ann", e.ann), ("text", e.text)) ++
        e.stats.map(("stats", _)).toSeq)
      .toDF("store", "seq").queryExecution.logical
  }

  /** `corpus_diff(corpusRoot, idCol, fromSeq, toSeq)` →
    * (idCol, change ∈ added|removed) between two text-tier seqs. */
  def buildDiff(args: Seq[Expression]): LogicalPlan = {
    val fn = "corpus_diff"
    require(args.length == 4,
      s"$fn(corpusRoot, idCol, fromSeq, toSeq) takes 4 arguments")
    val dir = strArg(args(0), fn, "corpus store directory")
    val idCol = strArg(args(1), fn, "id column name")
    val from = intArg(args(2), fn, "fromSeq")
    val to = intArg(args(3), fn, "toSeq")
    val s = SparkSession.active
    graft.ops.CorpusStore.membershipDiffAt(s,
        graft.ops.CorpusStore.forDir(s, dir, idCol), from, to)
      .queryExecution.logical
  }
}
