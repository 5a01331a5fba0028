package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ONE corpus, THREE indexes, ONE epoch — the orchestration layer a
  * deployed pipeline actually runs. A training-data corpus is served
  * through three derived artifacts at once: the curation store
  * (near-dup labels — [[CurationStore]]), the ANN index (dense
  * retrieval — [[AnnIndexStore]]) and the text index (sparse
  * retrieval — [[TextIndexStore]]). Maintaining them separately
  * invites the classic split-brain: a recrawl batch folded into the
  * text index but not the ANN index serves documents one modality
  * can see and the other cannot. This object makes the corpus
  * transaction a single call: [[ingest]] / [[delete]] apply one
  * batch to all three stores under ONE caller-chosen batch id.
  * An optional FOURTH member — the [[StatsStore]] monitoring tier
  * (per-source counters + sketches), mounted by [[build]]'s
  * `sourceCol` — rides the same batch ids, so a takedown can never
  * leave the counters describing documents the serving tiers no
  * longer admit: exact counters decrement at [[delete]], the
  * touched sources' sketches flip stale-until-[[compact]]
  * ([[StatsStore.delete]]'s two guarantee classes).
  *
  * Cross-store exactly-once rides each store's OWN epoch discipline
  * (`settleEntry` + `_applied` markers): there is deliberately no
  * global two-phase commit — on a shared-nothing cluster the
  * coordinator can die between any two store calls, so the contract
  * is CONVERGENCE UNDER REPLAY, not atomicity. A crash mid-ingest
  * leaves a prefix of the stores at the new epoch; re-issuing the
  * SAME call with the SAME batchId no-ops on the stores that
  * already folded it and applies it to the rest — after any number
  * of crashes and replays, all three stores converge on exactly-once
  * semantics per store (spec-fabricated: CorpusStoreSpec applies a
  * batch to one store directly, then replays the transaction).
  * The fixed application order (curation → ann → text) makes the
  * crash states enumerable, nothing more; any order converges.
  *
  * Scale: this layer adds NO data movement of its own — each call is
  * exactly the three per-store calls, whose shuffle shapes are
  * measured separately (SCALING tiers `incremental` / `ann_index`);
  * the batch frame is analyzed once per store (three jobs over the
  * same input — at 100 TB batch sizes, persist the batch before
  * calling if recomputing its lineage is expensive).
  */
object CorpusStore {

  /** Handles to the per-modality stores over one corpus.
    * `idCol` is shared — the whole point: one id space, so deletes
    * and ingests address all stores with the same keys.
    *
    * `stats` is the OPTIONAL fourth member: the monitoring tier
    * ([[StatsStore]] — per-source counters + sketches), maintained
    * under the SAME batchId as the serving stores so a takedown
    * never leaves the counters describing documents the serving
    * tiers no longer admit. `sourceCol` names the batch/corpus
    * column the stats tier groups by; it only matters when `stats`
    * is set.
    */
  final case class Stores(curation: CurationStore.Store,
      ann: AnnIndexStore.Index, text: TextIndexStore.Index,
      stats: Option[StatsStore.Store] = None,
      sourceCol: String = "source") {
    def idCol: String = curation.idCol
  }

  /** Build all three stores from one corpus frame carrying the id,
    * the raw text and the embedding. Per-store dials keep their own
    * defaults; layout knobs (label buckets, postings buckets) are
    * surfaced because they are the cluster-scale serving story.
    * The default ANN dials are [[AnnIndexStore.CorpusDials]]' moduli
    * RE-KEYED to `idCol` (the standing dials predicate on `vec_id`
    * and would not resolve against a differently-keyed corpus frame).
    */
  def build(corpus: DataFrame, idCol: String, textCol: String,
      vecCol: String, dir: String,
      annDials: Option[AnnIndexStore.Dials] = None,
      bucketLabels: Int = 0, bucketPostings: Int = 0,
      sourceCol: Option[String] = None): Stores = {
    val d = annDials.getOrElse {
      val c = AnnIndexStore.CorpusDials
      AnnIndexStore.Dials(col(idCol) % 50 === 7, col(idCol) % 10 === 3,
        c.m, c.subDim, c.iters)
    }
    val cur = CurationStore.build(corpus.select(col(idCol), col(textCol)),
      idCol, textCol, s"$dir/curation", bucketLabels = bucketLabels)
    // a rebuild starts a fresh gate history: inherited admission
    // rates describe another corpus life (the recall_log rule,
    // admission tier)
    StageSwap.remove(
      new org.apache.hadoop.fs.Path(s"${cur.dir}/gate_log")
        .getFileSystem(corpus.sparkSession.sessionState.newHadoopConf()),
      new org.apache.hadoop.fs.Path(s"${cur.dir}/gate_log"))
    val ann = AnnIndexStore.build(corpus.select(col(idCol), col(vecCol)),
      idCol, vecCol, s"$dir/ann", d.centroidPred,
      d.seedPred, d.m, d.subDim, d.iters)
    val text = TextIndexStore.build(corpus.select(col(idCol), col(textCol)),
      idCol, textCol, s"$dir/text", bucketPostings = bucketPostings)
    // the optional monitoring tier: per-source counters + sketches
    // over the same corpus, maintained under the same batch ids from
    // here on (see [[ingest]]/[[delete]])
    val stats = sourceCol.map(sc =>
      StatsStore.build(corpus.select(col(textCol), col(sc)),
        textCol, sc, s"$dir/stats"))
    Stores(cur, ann, text, stats, sourceCol.getOrElse("source"))
  }

  /** Fold `batch` (new, disjoint ids — each store's append contract)
    * into all three stores under ONE batch id. `batchId` is REQUIRED
    * here even though each store's API makes it optional: without
    * it a replay after a mid-transaction crash would double-apply
    * the batch to the stores that already folded it — the exact
    * failure this layer exists to rule out.
    */
  def ingest(st: Stores, batch: DataFrame, textCol: String,
      vecCol: String, batchId: String): Stores = {
    require(batchId.nonEmpty, "cross-store ingest requires a batchId")
    val idCol = st.idCol
    CurationStore.update(st.curation,
      batch.select(col(idCol), col(textCol)), textCol,
      batchId = Some(batchId))
    AnnIndexStore.add(st.ann, batch.select(col(idCol), col(vecCol)),
      vecCol, batchId = Some(batchId))
    TextIndexStore.update(st.text,
      batch.select(col(idCol), col(textCol)), textCol,
      batchId = Some(batchId))
    // fourth store, same epoch: the monitoring counters fold the
    // batch under the same id, so a replayed transaction no-ops here
    // exactly as in the serving tiers (the batch must carry
    // `sourceCol` when the stats tier is mounted)
    st.stats.foreach(x => StatsStore.update(x,
      batch.select(col(textCol), col(st.sourceCol)), textCol,
      st.sourceCol, batchId = Some(batchId)))
    st
  }

  /** Dedup-GATED ingest — the admission-controlled daily batch: the
    * raw batch is screened against the dedup tier's stored
    * signatures ([[CurationStore.screen]] — `hist_dup` for near-dups
    * of stored content, `batch_dup` for non-canonical members of
    * within-batch clusters), and ONLY the `kept` survivors fold into
    * the tiers under the one batch id. Returns the maintained
    * handles and the full per-doc decision frame — the quantity an
    * ingest pipeline logs (and bills crawlers by).
    *
    * This closes the loop the reference's fetch-what's-new refresh
    * gestures at and a 100 TB pipeline cannot run without: raw crawl
    * batches are dominated by recrawls and boilerplate, and folding
    * them uncensored would grow every index by the RAW feed while
    * [[Dedup.dedupIncremental]]'s store tracks the unique corpus.
    * Here the dedup tier's own signature stage IS that store — one
    * artifact plays both roles (cluster labels for curation,
    * admission history for ingest), kept coherent by the same
    * transaction epochs as everything else.
    *
    * Replay convergence (the layer's standing contract) holds
    * because the screen is defined against the store EXCLUDING the
    * batch's own ids: a coordinator crash after some tiers folded
    * the survivors re-runs the screen with those survivors already
    * in the signature stage, and without the exclusion the batch
    * would match ITSELF, admit nothing, and leave the remaining
    * tiers empty — with it the replayed decisions are the original
    * decisions exactly, each tier no-ops or folds by its own
    * `_applied` record, and all tiers converge on the same kept set
    * (spec-fabricated: a tier folds, the coordinator "dies", the
    * transaction replays).
    *
    * The decision frame pins the PRE-ingest snapshot at plan time,
    * so collecting it after the fold still answers from the corpus
    * the batch was screened against. Each tier's fold re-evaluates
    * the `kept` lineage (screen included — its cluster fixpoint is
    * cached, the LSH join is not): at 100 TB batch sizes, persist
    * the batch (or materialize the decisions) before calling if
    * recomputing it is expensive — the same caveat as [[ingest]],
    * one stage deeper.
    */
  def ingestScreened(st: Stores, batch: DataFrame, textCol: String,
      vecCol: String, batchId: String,
      numBands: Int = CurationStore.UseStoredDials,
      minEst: Double = CurationStore.UseStoredDials,
      maxBucketSize: Long = Long.MaxValue,
      benchmark: Option[DataFrame] = None, benchK: Int = 3,
      benchMinOverlap: Int = 2, semanticTau: Option[Double] = None,
      semanticNprobe: Int = 1,
      benchmarkStore: Option[BenchmarkStore.Store] = None)
      : (Stores, DataFrame) = {
    // one copy of the gate logic: the attributed form's, minus its
    // receipt columns (the same delegation as
    // [[Dedup.incrementalDecisions]], for the same drift reason);
    // `bench_rev` — the versioned gate's provenance column — is NOT
    // receipt detail and survives the drop
    val (out, dec) = ingestScreenedAttributed(st, batch, textCol,
      vecCol, batchId, numBands, minEst, maxBucketSize, benchmark,
      benchK, benchMinOverlap, semanticTau, semanticNprobe,
      benchmarkStore)
    (out, dec.drop("dup_of", "adc"))
  }

  /** [[ingestScreened]] with ATTRIBUTION — every rejection names its
    * evidence, the receipt a takedown-provenance or crawler-billing
    * pipeline joins on. The decision frame carries two extra
    * columns beside (idCol, status):
    *
    *  - `dup_of` — the attributed winner: the stored best lexical
    *    match for a `hist_dup` (max estimate, min id on ties), the
    *    within-batch canonical for a `batch_dup`
    *    ([[CurationStore.screenAttributed]]'s contract), and — the
    *    semantic axis finally reaching parity with the lexical one —
    *    the nearest STORED neighbor for a `semantic_dup`
    *    ([[AnnIndexStore.semanticDups]]' `nn_id`). NULL for `kept`
    *    and for `contaminated` (that rejection names the benchmark,
    *    not a document).
    *  - `adc` — the `semantic_dup` rows' top-1 PQ distance (the
    *    quantity `tau` gated on, kept so the threshold stays
    *    auditable per decision); NULL on every other status.
    *
    * Dropping both columns recovers [[ingestScreened]]'s frame
    * exactly — spec-pinned, and structurally guaranteed: the plain
    * form IS this one with the columns dropped.
    */
  def ingestScreenedAttributed(st: Stores, batch: DataFrame,
      textCol: String, vecCol: String, batchId: String,
      numBands: Int = CurationStore.UseStoredDials,
      minEst: Double = CurationStore.UseStoredDials,
      maxBucketSize: Long = Long.MaxValue,
      benchmark: Option[DataFrame] = None, benchK: Int = 3,
      benchMinOverlap: Int = 2, semanticTau: Option[Double] = None,
      semanticNprobe: Int = 1,
      benchmarkStore: Option[BenchmarkStore.Store] = None)
      : (Stores, DataFrame) = {
    require(batchId.nonEmpty,
      "cross-store screened ingest requires a batchId")
    require(benchmark.isEmpty || benchmarkStore.isEmpty,
      "pass the benchmark as a raw frame OR a versioned store, " +
        "not both")
    val s = batch.sparkSession
    // with a benchmark mounted, eval-set leakage is a FOURTH status
    // (`contaminated`, overriding the dedup statuses) and those docs
    // never fold — [[CurationStore.screenDecontaminated]]'s contract;
    // contamination is history-independent so replay is unchanged.
    // The VERSIONED form ([[BenchmarkStore]]) pins one eval revision
    // per batchId BEFORE any tier folds — so even the benchmark
    // itself drifting between a crash and its replay cannot move the
    // decisions — and stamps the decisions with `bench_rev`, the
    // which-eval-set-gated-batch-N provenance
    val lexical = (benchmark, benchmarkStore) match {
      case (Some(bench), _) =>
        CurationStore.screenDecontaminatedAttributed(
          s, st.curation, batch, textCol, bench, benchK,
          benchMinOverlap, numBands, minEst, maxBucketSize)
      case (None, Some(bs)) =>
        val pinned = BenchmarkStore.pinForBatch(s, bs, batchId)
        CurationStore.screenDecontaminatedAttributedShingled(
            s, st.curation, batch, textCol, pinned.shingles(s),
            pinned.k, benchMinOverlap, numBands, minEst,
            maxBucketSize)
          .withColumn("bench_rev", lit(pinned.seq))
      case (None, None) => CurationStore.screenAttributed(s,
        st.curation, batch, textCol, numBands, minEst, maxBucketSize)
    }
    val revCols =
      if (lexical.columns.contains("bench_rev")) Seq(col("bench_rev"))
      else Seq.empty
    // the SEMANTIC gate runs LAST, demoting only would-be-kept docs
    // to `semantic_dup` ([[AnnIndexStore.semanticDups]] against the
    // ann tier): every already-rejected doc keeps its more specific
    // reason (and its lexical attribution), and the flags exclude
    // the batch's own ids so the replay discipline matches the
    // lexical screen's
    val decisions = semanticTau match {
      case None =>
        lexical.select(Seq(col(st.idCol), col("status"),
          col("dup_of"), lit(null).cast("double").as("adc")) ++
          revCols: _*)
      case Some(tau) =>
        val demoted = col("status") === "kept" &&
          col("_sem_of").isNotNull
        val flagged = AnnIndexStore.semanticDups(s, st.ann,
            batch.select(col(st.idCol), col(vecCol)), st.idCol,
            vecCol, tau, semanticNprobe)
          .filter(col("flagged"))
          .select(col(st.idCol), col("nn_id").as("_sem_of"),
            col("adc").as("_sem_adc"))
        lexical.join(flagged, Seq(st.idCol), "left")
          .select(Seq(col(st.idCol),
            when(demoted, "semantic_dup")
              .otherwise(col("status")).as("status"),
            when(demoted, col("_sem_of"))
              .otherwise(col("dup_of")).as("dup_of"),
            when(demoted, col("_sem_adc")).as("adc")) ++ revCols: _*)
    }
    val kept = batch.join(
      decisions.filter(col("status") === "kept").select(col(st.idCol)),
      Seq(st.idCol), "left_semi")
    val out = ingest(st, kept, textCol, vecCol, batchId)
    appendGateLog(s, st.curation.dir, batchId, decisions)
    (out, decisions)
  }

  /** GATE HEALTH log — one row per gated batch appended to the
    * curation tier's `gate_log` ([[AnnIndexStore.recallProbe]]'s
    * recall_log convention: advisory monitoring data beside the
    * store, not a store stage — no marker, and a replayed
    * transaction's duplicate append carries the same reproduced
    * decisions, so it skews no reading). The row is the decision
    * mix plus the two rates the [[Advisor]] alarms on: `admit_rate`
    * collapsing says the crawler is resending the corpus (or the
    * gate broke); `semantic_rate` spiking says τ drifted or a
    * near-copy storm is at the door. `seq` orders the log (the
    * single-writer contract makes the read-increment safe).
    */
  private def appendGateLog(s: SparkSession, curationDir: String,
      batchId: String, decisions: DataFrame): Unit = {
    val dir = s"$curationDir/gate_log"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sessionState.newHadoopConf())
    val nextSeq =
      if (!fs.exists(new org.apache.hadoop.fs.Path(dir))) 1L
      else s.read.parquet(dir).agg(coalesce(max(col("seq")), lit(0L)))
        .head().getLong(0) + 1
    def n(status: String) =
      sum(when(col("status") === status, 1L).otherwise(0L))
    decisions.agg(count(lit(1)).as("n_total"),
        n("kept").as("n_kept"), n("hist_dup").as("n_hist_dup"),
        n("batch_dup").as("n_batch_dup"),
        n("contaminated").as("n_contaminated"),
        n("semantic_dup").as("n_semantic_dup"))
      .select(lit(nextSeq).as("seq"), lit(batchId).as("batch_id"),
        col("n_total"), col("n_kept"), col("n_hist_dup"),
        col("n_batch_dup"), col("n_contaminated"),
        col("n_semantic_dup"),
        round(col("n_kept") / col("n_total"), 4).as("admit_rate"),
        round(col("n_semantic_dup") / col("n_total"), 4)
          .as("semantic_rate"))
      .write.mode("append").parquet(dir)
  }

  /** Tombstone `ids` in all three stores under ONE batch id —
    * the takedown / right-to-be-forgotten path. Serving is exact
    * from the next read on in every store (masked reads, exact
    * counter decrements); [[compact]] makes the removals physical.
    */
  def delete(st: Stores, ids: DataFrame, batchId: String,
      deletedDocs: Option[DataFrame] = None,
      textCol: String = "text"): Stores = {
    require(batchId.nonEmpty, "cross-store delete requires a batchId")
    require(st.stats.isEmpty || deletedDocs.isDefined,
      "a stats-bearing transaction needs the doomed docs' own rows " +
        "(text + source) — counters are multiset aggregates, so only " +
        "the docs' content says what to subtract")
    CurationStore.delete(st.curation, ids, batchId = Some(batchId))
    AnnIndexStore.delete(st.ann, ids, batchId = Some(batchId))
    TextIndexStore.delete(st.text, ids, batchId = Some(batchId))
    // fourth store, same epoch: exact counters decrement, the
    // touched sources' sketches flip stale-until-compact
    // ([[StatsStore.delete]]'s contract)
    st.stats.foreach(x => StatsStore.delete(x,
      deletedDocs.get.select(col(textCol), col(st.sourceCol)),
      textCol, st.sourceCol, batchId = Some(batchId)))
    st
  }

  /** Compact all three stores: removals become physical, deltas fold
    * into their bases, the curation components fixpoint re-resolves
    * (the bridge-split step), tombstones clear, ids free for re-add.
    * Returns fresh handles (curation compaction rewrites the label
    * topology and may re-register its bucketed table).
    */
  def compact(s: SparkSession, st: Stores, labelBuckets: Int = 8,
      liveCorpus: Option[DataFrame] = None,
      textCol: String = "text"): Stores = {
    require(st.stats.isEmpty || liveCorpus.isDefined,
      "a stats-bearing transaction compacts its sketch debt by " +
        "re-deriving from the LIVE corpus — pass it")
    val out = Stores(CurationStore.compact(s, st.curation, labelBuckets),
      AnnIndexStore.compact(s, st.ann),
      TextIndexStore.compact(s, st.text),
      st.stats, st.sourceCol)
    // fourth store: the one full aggregation pass that settles the
    // sketch debt deletes accrued (stale flags clear, every field
    // back at its build-fresh guarantee)
    st.stats.foreach(x => StatsStore.compact(x,
      liveCorpus.get.select(col(textCol), col(st.sourceCol)),
      textCol, st.sourceCol))
    out
  }

  /** The quad's CURRENT snapshot-log seqs. An orchestrator captures
    * this BEFORE a transaction; [[rollback]] takes it to undo
    * everything the transaction (and anything after it) folded. One
    * tiny listing per store, no jobs. */
  final case class Epochs(curation: Int, ann: Int, text: Int,
      stats: Option[Int])

  def snapshotSeqs(s: SparkSession, st: Stores): Epochs = {
    def last(dir: String): Int = {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sessionState.newHadoopConf())
      StoreVersions.snapshots(fs, dir).last._1
    }
    Epochs(last(st.curation.dir), last(st.ann.dir), last(st.text.dir),
      st.stats.map(x => last(x.dir)))
  }

  /** TRANSACTION-LEVEL rollback: undo every batch folded since the
    * [[snapshotSeqs]] capture, across all four tiers — the
    * bad-crawl-hit-every-store recovery. Every tier rolls back
    * through its own snapshot log ([[StoreVersions.rollbackTo]]
    * semantics: the serving stores surgically delete the files
    * folded since off the flip-time manifests; the monitoring tier's
    * single pure-replace stage flips back — each version holds the
    * complete per-source row set, so no corpus pass is needed), and
    * `_applied` clears everywhere so the undone ids fold again.
    *
    * Same convergence-under-replay contract as [[ingest]]/[[delete]]:
    * there is no global two-phase commit — a coordinator crash
    * between per-store rollbacks leaves a prefix undone, and
    * RE-RUNNING the same rollback completes it (each store's
    * rollback is idempotent at its target seq: already-rolled-back
    * stores delete nothing and re-flip to the same state; the
    * per-store rollbacks skip gc precisely so the replay still finds
    * its target snapshot).
    */
  def rollback(s: SparkSession, st: Stores, at: Epochs): Stores = {
    require(st.stats.isEmpty || at.stats.isDefined,
      "the capture predates the stats tier's mount — roll the " +
        "monitoring tier forward by StatsStore.compact instead")
    CurationStore.rollback(s, st.curation, at.curation)
    AnnIndexStore.rollback(s, st.ann, at.ann)
    TextIndexStore.rollback(s, st.text, at.text)
    st.stats.foreach(x => StatsStore.rollback(s, x, at.stats.get))
    st
  }

  /** TRANSACTION-LEVEL clone: materialize the quad as of one
    * [[snapshotSeqs]] capture into `dstRoot` — four independent
    * stores under the standard layout (curation/ann/text/stats), the
    * fork/DR twin of [[rollback]] that touches NOTHING in the
    * source. Each tier clones through its own
    * [[StoreVersions.cloneAt]] (append stages at their flip-time
    * file manifests, one birth-flip per store), so the clone serves
    * the captured epochs coherently across modalities — the same
    * cross-store consistency contract the live quad maintains,
    * frozen at the capture. The clone's lineages are fresh (no
    * `_applied` witnesses): replaying the source's post-capture
    * batches into it is the natural way to roll it forward.
    *
    * Convergence under replay — the transaction layer's standing
    * contract — applies to the clone too: a coordinator crash
    * mid-clone leaves a PREFIX of the tiers committed (a tier's
    * birth-flip is its last step, so a committed dst manifest proves
    * that tier's copy complete), and RE-RUNNING the same call
    * against the same `dstRoot` skips the committed tiers verbatim
    * and redoes the uncommitted ones from scratch (half-copied
    * debris without a manifest is swept before the redo).
    * Spec-fabricated both ways: a committed prefix, and a torn
    * manifest-less tier.
    */
  def cloneAt(s: SparkSession, st: Stores, at: Epochs,
      dstRoot: String): Stores = {
    require(st.stats.isEmpty || at.stats.isDefined,
      "the capture predates the stats tier's mount — capture again " +
        "with the tier mounted")
    val fs = new org.apache.hadoop.fs.Path(dstRoot)
      .getFileSystem(s.sessionState.newHadoopConf())
    // resume rule: a committed manifest proves the tier's clone
    // complete (the flip is last); anything else is debris to sweep
    def tier[A](sub: String, reopen: => A)(doIt: => A): A = {
      val dir = s"$dstRoot/$sub"
      if (fs.exists(StoreVersions.manifestPath(dir))) reopen
      else {
        StageSwap.remove(fs, new org.apache.hadoop.fs.Path(dir))
        doIt
      }
    }
    Stores(
      tier("curation", CurationStore.forDir(s, s"$dstRoot/curation",
          st.curation.idCol))(
        CurationStore.cloneAt(s, st.curation, at.curation,
          s"$dstRoot/curation")),
      tier("ann", AnnIndexStore.Index(s"$dstRoot/ann", st.ann.idCol,
          st.ann.m, st.ann.subDim))(
        AnnIndexStore.cloneAt(s, st.ann, at.ann, s"$dstRoot/ann")),
      tier("text", TextIndexStore.forDir(s, s"$dstRoot/text",
          st.text.idCol))(
        TextIndexStore.cloneAt(s, st.text, at.text,
          s"$dstRoot/text")),
      st.stats.map(x => tier("stats",
          StatsStore.Store(s"$dstRoot/stats"))(
        StatsStore.cloneAt(s, x, at.stats.get, s"$dstRoot/stats"))),
      st.sourceCol)
  }

  /** Execute the [[Advisor]]'s advice — the operational loop CLOSED:
    * read the signals, compact exactly the stores whose signals are
    * overdue, touch nothing else. [[compact]] above is the blanket
    * maintenance window (everything rewrites, advised or not);
    * `maintain` is what a scheduler runs after every transaction —
    * at 100 TB the difference is whether a 2-byte tombstone file
    * triggers a corpus-wide re-resolve or nothing at all.
    *
    *  - `compact` advice executes per store (curation / ann / text /
    *    stats) through the store's own compact — each under its own
    *    [[UpdateMarker]] discipline, so a crash mid-maintain replays
    *    like any other maintenance crash and non-advised stores are
    *    provably untouched (spec-pinned by manifest equality).
    *  - `rebuild` advice (the ANN recall floor) executes ONLY when
    *    the caller supplies the re-train inputs — `annCorpus` (the
    *    live id + vector frame) and `annDials` — because a re-train
    *    needs the raw corpus and the training dials, which the
    *    stores deliberately do not persist. With both present, the
    *    advised re-train runs [[AnnIndexStore.build]] in place (the
    *    build resets the previous life: codes, tombstones AND the
    *    recall_log, so the post-maintenance readout starts a fresh
    *    staleness history — the loop is closed end to end, drift →
    *    advice → re-train → recovered serving, spec-pinned with a
    *    planted-drift fixture). Without them the row stays in the
    *    returned readout for the caller's scheduler, exactly as
    *    before — the advisor tells the operator, and the operator
    *    either owns the re-train or hands maintain the inputs. A
    *    rebuild supersedes any `compact` advice on the same store
    *    (the fresh build has nothing to fold).
    *  - the stats tier's compact re-derives from the LIVE corpus
    *    ([[StatsStore.compact]]'s contract), so `liveCorpus` is
    *    required exactly when that store's debt is due.
    *
    * Returns the maintained handles and the POST-maintenance advice
    * readout (every executed action's row back at `ok`; an executed
    * rebuild's recall row GONE — the fresh log; unexecuted `rebuild`
    * rows passed through). Cost: the advisor's file listings + the
    * advised compacts + (opted-in) the advised re-train — an all-ok
    * readout costs zero jobs.
    */
  def maintain(s: SparkSession, st: Stores, labelBuckets: Int = 8,
      liveCorpus: Option[DataFrame] = None,
      textCol: String = "text",
      annCorpus: Option[DataFrame] = None,
      vecCol: String = "embedding",
      annDials: Option[AnnIndexStore.Dials] = None)
      : (Stores, DataFrame) = {
    // the advice frame is ≤ 8 one-row probes — driver-sized by design
    val advice = Advisor.advise(s, st)
      .select("store", "action").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val due = advice.collect { case (store, "compact") => store }.toSet
    val rebuildAnn = advice.contains(("ann", "rebuild")) &&
      annDials.isDefined
    require(!rebuildAnn || annCorpus.isDefined,
      "the ANN re-train is opted in (dials passed) and due: it " +
        "trains from the LIVE corpus vectors — pass annCorpus")
    require(!due("stats") || liveCorpus.isDefined,
      "the stats tier's sketch debt is due: its compact re-derives " +
        "from the LIVE corpus — pass it")
    val idc = st.idCol
    val ann =
      if (rebuildAnn) {
        val d = annDials.get
        AnnIndexStore.build(
          annCorpus.get.select(col(idc), col(vecCol)), idc, vecCol,
          st.ann.dir, d.centroidPred, d.seedPred, d.m, d.subDim,
          d.iters)
      } else if (due("ann")) AnnIndexStore.compact(s, st.ann)
      else st.ann
    val out = Stores(
      if (due("curation")) CurationStore.compact(s, st.curation,
        labelBuckets) else st.curation,
      ann,
      if (due("text")) TextIndexStore.compact(s, st.text) else st.text,
      st.stats, st.sourceCol)
    if (due("stats"))
      st.stats.foreach(x => StatsStore.compact(x,
        liveCorpus.get.select(col(textCol), col(st.sourceCol)),
        textCol, st.sourceCol))
    (out, Advisor.advise(s, out))
  }

  /** Per-store LIVE membership counts — (curation, ann, text). The
    * operational split-brain probe: after every completed
    * transaction `ann == text` EXACTLY (both stores hold one row per
    * ingested id — codes and doclens), and the curation count equals
    * the number of SIGNABLE live docs: its membership stage is the
    * minhash signatures, and a doc shorter than the shingle width
    * (< 3 tokens) never signs ([[Dedup.minhashSignatures]] emits no
    * row — such a doc can never LSH-match anything, so the dedup
    * tier correctly has no record of it). On a corpus where every
    * doc clears the shingle width all three agree; a curation count
    * BELOW the others by exactly the short-doc population is
    * healthy, while `ann != text`, or a curation drift that moves
    * batch-over-batch without short docs arriving, is the alarm
    * that a transaction was left mid-replay (CorpusStoreSpec pins
    * both the three-way equality on a signable corpus and the
    * short-doc offset). THREE METADATA READS, not scans: each store
    * maintains an exact one-row live counter through its own commit
    * (the ann/text stats flip IS their commit; curation folds its
    * counter under the live marker and recomputes at crash
    * settlement), so the probe costs nothing at any corpus scale —
    * run it after every batch.
    */
  def liveCounts(s: SparkSession, st: Stores): (Long, Long, Long) =
    (CurationStore.liveCount(s, st.curation),
      AnnIndexStore.liveCount(s, st.ann),
      TextIndexStore.liveCount(s, st.text))

  /** [[liveCounts]] plus the monitoring tier as a FOURTH probe: the
    * stats store's summed exact per-source `docs` counters (a
    * broadcast-sized one-row-per-source read). On a stats-bearing
    * transaction this equals the text/ann count after every
    * completed batch — the stats tier counts every doc, signable or
    * not, and [[StatsStore.delete]] decrements it exactly — so a
    * fourth number drifting from the second/third is the
    * counters-vs-serving split-brain this tier's membership in the
    * transaction exists to rule out. None when no stats tier is
    * mounted.
    */
  def liveCountsAll(s: SparkSession, st: Stores)
      : (Long, Long, Long, Option[Long]) = {
    val (c, a, t) = liveCounts(s, st)
    (c, a, t, st.stats.map(_.stats(s)
      .agg(coalesce(sum("docs"), lit(0L))).head().getLong(0)))
  }

  /** Deterministic local root for a corpus-store triple over
    * `dataDir` (the shared [[StoreDirs]] scheme, separate root). */
  def storeDirFor(dataDir: String, suffix: String = ""): String =
    StoreDirs.dirFor("target/corpus-store/", dataDir, suffix)
}
