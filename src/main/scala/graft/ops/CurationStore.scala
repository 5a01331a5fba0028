package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The curation pipeline as STAGED PARQUET ARTIFACTS — the shape a
  * real 100 TB dedup run takes: the expensive products of the
  * near-dup machinery (minhash signatures → thresholded candidate
  * pairs → connected-component cluster labels) are each written ONCE
  * as a table, and every downstream consumer — corpus rewrite (q50),
  * savings report (q113), leak-free split (q119), best-of-cluster
  * selection (q121) — reads the label TABLE instead of re-running
  * the LSH kernel and the components fixpoint per query. This is the
  * same high-water discipline the incremental operators already
  * apply to signatures (q53) and ANN assignments (q67), lifted to
  * the whole pipeline (reference pattern: `src/util.rs:62-66` —
  * fetch what's new, reuse what's stored).
  *
  * Stage lineage is CUT at every boundary by the parquet round-trip:
  * stage n+1's plan starts at a columnar scan of stage n's output,
  * so nothing is persisted, no fixpoint lineage escapes, and a
  * failed stage re-runs alone. At cluster scale the labels table is
  * written bucketed by `idCol` — [[build]]'s `bucketLabels` dial
  * wires it: every consumer's label join against a same-bucketed
  * corpus plans with ZERO exchanges (CurationStoreSpec pins the
  * shape; q76/BucketedJoinSpec demonstrate the raw mechanics).
  * Maintenance and the read-optimized layout COMPOSE: [[update]]
  * folds batches into a plain delta stage beside the bucketed base,
  * [[labelJoin]] serves zero-exchange reads over base-plus-delta,
  * [[compact]] folds the delta back in. The battery's local stores
  * keep plain parquet throughout.
  *
  * Equivalence to the fused (per-query standalone) forms is proven
  * twice: CurationStoreSpec asserts store-fed q50/q121 results are
  * frame-identical to the standalone operators, and the four
  * store-fed queries stay hash-green against DuckDB oracles that
  * recompute everything from the raw corpus.
  */
object CurationStore {

  /** Handle to a built store: three parquet tables under `dir`.
    * `signatures`: (idCol, h0..h{n-1}) — one row per doc with ≥1
    * shingle; `pairs`: (a, b, est_jaccard) ≥ the build's `minEst`;
    * `labels`: (idCol, cluster) for every doc in any pair, cluster =
    * component-minimum id.
    *
    * `labelsTable` is set when the labels stage was written BUCKETED
    * by `idCol` ([[build]]'s `bucketLabels` dial): bucket layout only
    * survives through the catalog (a plain parquet scan of the same
    * files forgets the hash distribution), so bucketed labels read as
    * a table and every consumer joining a corpus bucketed the same
    * way gets a ZERO-exchange label join — the shuffle is paid once
    * at store-write time, never again per consumer.
    */
  final case class Store(dir: String, idCol: String,
      labelsTable: Option[String] = None) {

    def tombDir: String = s"$dir/tombstones"

    private[ops] def tombstonesIfAny(s: SparkSession): Option[DataFrame] =
      Tombstones.ifAny(s, tombDir)

    /** Drop tombstoned docs' rows from a stage view by the named id
      * column(s) — [[CurationStore.delete]]'s immediate serving
      * contract: membership of deleted docs disappears from every
      * read at once (labels, signatures, both endpoints of pairs),
      * while cluster TOPOLOGY (a bridge doc's transitive merges)
      * refreshes at the next [[CurationStore.compact]], which
      * re-resolves components over the physically filtered pairs.
      * Broadcast while the set is small, shuffle past the
      * [[CurationStore.TombBroadcastMaxBytes]] ceiling.
      */
    private[ops] def tombMask(s: SparkSession, df: DataFrame,
        onCols: Seq[String]): DataFrame =
      Tombstones.mask(s, df, idCol, tombDir,
        CurationStore.TombBroadcastMaxBytes,
        CurationStore.tombBroadcastDefault, onCols)

    def signatures(s: SparkSession): DataFrame =
      tombMask(s, s.read.parquet(s"$dir/signatures"), Seq(idCol))
    def pairs(s: SparkSession): DataFrame =
      tombMask(s, s.read.parquet(s"$dir/pairs"), Seq("a", "b"))

    /** Plain-parquet DELTA stage beside a bucketed labels table —
      * how a read-optimized store stays MAINTAINABLE: [[update]]
      * folds each batch's label changes here (rename-swap, same as
      * the plain store's whole stage), [[compact]] periodically
      * folds the delta back into a fresh bucketed base. Small by
      * construction: one row per label that DIFFERS from the base
      * (new docs + relabels since the last compaction), so it stays
      * broadcastable between reasonable compaction intervals.
      */
    def deltaDir: String = s"$dir/labels_delta"

    private[ops] def deltaIfAny(s: SparkSession): Option[DataFrame] = {
      val p = new org.apache.hadoop.fs.Path(deltaDir)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(p) && UpdateMarker.listFiles(fs, deltaDir).nonEmpty)
        Some(s.read.parquet(deltaDir))
      else None
    }

    /** Outstanding delta's total file bytes — read off the listing,
      * never a job. The broadcast-vs-shuffle decision input. */
    private[ops] def deltaBytes(s: SparkSession): Long = {
      val p = new org.apache.hadoop.fs.Path(deltaDir)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      if (!fs.exists(p)) 0L
      else fs.listStatus(p).toSeq.filter(_.isFile)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(_.getLen).sum
    }

    /** The store's effective label map. Plain store: the labels
      * stage. Bucketed store: the base table overridden by the delta
      * (delta rows win; base rows not in the delta pass through) —
      * consumers that want the zero-exchange bucketed join shape
      * should go through [[labelJoin]] instead of joining this
      * union frame directly.
      */
    def labels(s: SparkSession): DataFrame = {
      // catalog fallback: inside compact()'s re-registration window
      // the table is deliberately absent (dropped BEFORE the file
      // commit so stale bucket metadata can never describe new
      // files) — reading the files directly loses only the bucket
      // DISTRIBUTION (a plan property), never rows
      val base = labelsTable.filter(s.catalog.tableExists).map(s.table)
        .getOrElse(s.read.parquet(s"$dir/labels"))
      tombMask(s, deltaIfAny(s) match {
        case None => base
        case Some(delta) =>
          base.join(
              CurationStore.maybeBroadcast(s, this,
                delta.select(col(idCol))),
              Seq(idCol), "left_anti")
            .unionByName(delta)
      }, Seq(idCol))
    }
  }

  /** Ceiling (bytes of tombstone parquet) up to which the deleted-id
    * mask rides reads as a BROADCAST; past it the mask degrades to a
    * shuffle anti-join instead of OOMing ([[DeltaBroadcastMaxBytes]]'
    * rule for the deletion set — hitting it means [[compact]] is
    * overdue). */
  val TombBroadcastMaxBytes = "spark.graft.curation.tombBroadcastMaxBytes"
  private[ops] val tombBroadcastDefault = 32L * 1024 * 1024

  private[ops] def tombBroadcastable(s: SparkSession,
      store: Store): Boolean =
    Tombstones.broadcastable(s, store.tombDir, TombBroadcastMaxBytes,
      tombBroadcastDefault)

  /** Ceiling (bytes of delta parquet) up to which the outstanding
    * delta rides label reads as a BROADCAST. The delta grows with
    * drift since the last [[compact]] — unbounded if a caller keeps
    * folding batches without compacting — and broadcasting an
    * arbitrarily large frame is a driver/executor OOM, so past this
    * size the readers degrade to the one-exchange shuffle shape
    * (correct rows, zero-exchange claim void) instead of failing.
    * The right response to hitting it is to run [[compact]].
    */
  val DeltaBroadcastMaxBytes = "spark.graft.curation.deltaBroadcastMaxBytes"
  private val deltaBroadcastDefault = 32L * 1024 * 1024

  private[ops] def deltaBroadcastable(s: SparkSession,
      store: Store): Boolean =
    store.deltaBytes(s) <= s.conf
      .get(DeltaBroadcastMaxBytes, deltaBroadcastDefault.toString).toLong

  private def maybeBroadcast(s: SparkSession, store: Store,
      df: DataFrame): DataFrame =
    if (deltaBroadcastable(s, store)) broadcast(df) else df

  // ---- exact live-membership counter ------------------------------
  //
  // One row (`n`) at `$dir/stats`: the LIVE signable-doc count — the
  // number of rows a masked signatures scan would return — so the
  // operational membership probe ([[liveCount]],
  // [[CorpusStore.liveCounts]]) is a metadata read, never a stage
  // scan. Unlike [[TextIndexStore]]/[[AnnIndexStore]] (where the
  // stats version flip IS the commit), this store commits through
  // the labels [[StageSwap]], so the counter cannot ride the commit
  // atomically. The discipline instead:
  //  - happy path: [[update]]/[[delete]] fold the batch's exact
  //    delta into a fresh stats swap AFTER the labels commit;
  //  - any crash: the writer's live marker doubles as the evidence
  //    the counter may lag its store — [[settleEntry]] plants a
  //    durable `stats_stale` sentinel BEFORE adjudicating, then
  //    recomputes the counter from the settled masked signatures
  //    (exact by definition) and clears the sentinel. A crash inside
  //    that recovery leaves the sentinel, so [[liveCount]] degrades
  //    to the exact slow path (count masked signatures) rather than
  //    ever serving a stale number.

  private def statsDir(store: Store): String = s"${store.dir}/stats"
  private def staleSentinel(store: Store) =
    new org.apache.hadoop.fs.Path(s"${store.dir}/stats_stale")

  /** Swap a fresh one-row counter in at `$dir/stats` (write-to-next
    * + [[StageSwap.swapIn]] — a crash mid-swap never destroys the
    * prior counter, and the sentinel discipline above covers the
    * value's currency). `next` is a LAZY one-row frame (`n`): the
    * whole fold — prior counter read, batch-delta aggregate, write —
    * runs as ONE job at the write, never as separate driver actions
    * (the counter must not tax every update with extra job
    * round-trips; the bench prices maintenance per batch). */
  private def writeStats(spark: SparkSession, store: Store,
      next: DataFrame): Unit = {
    next.write.mode("overwrite").parquet(s"${statsDir(store)}.next")
    StageSwap.swapIn(spark, statsDir(store))
  }

  /** The stored counter plus a one-row `_dn` delta frame, fused
    * lazily — [[writeStats]]'s input for the additive fold (a
    * decrement passes a negated `_dn`). */
  private def statsPlus(spark: SparkSession, store: Store,
      delta: DataFrame): DataFrame =
    spark.read.parquet(statsDir(store)).crossJoin(delta)
      .select((col("n") + col("_dn")).as("n"))

  /** Eager scalar read of the stored counter — [[liveCount]]'s fast
    * path only; the writers fold through [[statsPlus]] instead so
    * maintenance never pays a separate driver action for it. */
  private def readStats(spark: SparkSession, store: Store): Long =
    spark.read.parquet(statsDir(store)).head().getLong(0)

  /** The LIVE signable-doc count. One-row metadata read whenever the
    * counter is proven current (every completed writer call leaves
    * it exact); the exact slow path — a masked signatures count —
    * only while a `stats_stale` sentinel from an unsettled crash is
    * outstanding. Spec-pinned equal to `signatures(s).count()`
    * through build/update/delete/compact, crash healing and batchId
    * replay. */
  def liveCount(s: SparkSession, store: Store): Long = {
    val fs = new org.apache.hadoop.fs.Path(store.dir)
      .getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(staleSentinel(store)))
      store.signatures(s).count()
    else readStats(s, store)
  }

  /** The [[UpdateMarker]] stage map [[update]] and [[compact]] share
    * — one definition so the two writers' settle/snapshot protocol
    * cannot drift apart: `labels` is the commit stage (the one a
    * swap replaces — the delta beside a bucketed base, the whole
    * labels stage for a plain store), sig/pairs are append-only.
    */
  private def stageMap(store: Store): Map[String, String] = Map(
    "sig" -> s"${store.dir}/signatures",
    "pairs" -> s"${store.dir}/pairs",
    "tomb" -> store.tombDir,
    "labels" -> (if (store.labelsTable.isDefined) store.deltaDir
                 else s"${store.dir}/labels"))

  /** Shared writer entry: roll back half-swapped stages (compact's
    * re-resolve swaps signatures and pairs too), ROLL FORWARD a
    * re-resolve compact that committed its labels swap but died
    * before removing the delta/tombstone files it folded (a stale
    * delta row would otherwise OVERRIDE a re-resolved label forever
    * — the [[TextIndexStore]] roll-forward discipline; commitment is
    * witnessed by the labels listing differing from the
    * `labels.swap` snapshot), then settle through
    * [[UpdateMarker.settle]].
    */
  private def settleEntry(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, store: Store,
      batchId: Option[String]): Boolean = {
    for (st <- Seq("signatures", "pairs"))
      StageSwap.recover(spark, s"${store.dir}/$st")
    StageSwap.recover(spark, s"${store.dir}/labels")
    StageSwap.recover(spark, statsDir(store))
    val marker = UpdateMarker.markerPath(store.dir)
    // a predecessor's marker (or an unfinished recovery's sentinel)
    // means the exact counter may lag the store — make the staleness
    // DURABLE before touching anything, recompute after settlement
    val counterSuspect = fs.exists(staleSentinel(store)) ||
      UpdateMarker.read(fs, marker).isDefined
    if (counterSuspect && !fs.exists(staleSentinel(store)))
      fs.create(staleSentinel(store), true).close()
    UpdateMarker.read(fs, marker)
      .filter(_.listings.contains("labels.swap")).foreach { prior =>
        val committed =
          UpdateMarker.listFiles(fs, s"${store.dir}/labels") !=
            prior.listings("labels.swap")
        if (committed) {
          (prior.listings.getOrElse("fold", Set.empty[String]) ++
              prior.listings.getOrElse("tombfold", Set.empty[String]))
            .foreach(f => StageSwap.remove(fs,
              new org.apache.hadoop.fs.Path(f)))
          for (d <- Seq(store.deltaDir, store.tombDir)) {
            if (UpdateMarker.listFiles(fs, d).isEmpty)
              StageSwap.remove(fs, new org.apache.hadoop.fs.Path(d))
            spark.catalog.refreshByPath(d)
          }
        }
        UpdateMarker.delete(fs, marker)
      }
    val applied = UpdateMarker.settle(spark, fs, store.dir, "labels",
      stageMap(store), batchId)
    if (counterSuspect) {
      // settlement is done (healed or rolled forward) — the masked
      // signatures ARE the live membership now; recompute the exact
      // counter from them and clear the sentinel. A crash anywhere
      // in here leaves the sentinel, and liveCount stays exact via
      // its slow path until the next writer re-runs this block.
      writeStats(spark, store,
        store.signatures(spark).agg(count(lit(1)).as("n")))
      StageSwap.remove(fs, staleSentinel(store))
    }
    applied
  }

  /** Deterministic catalog name for `storeDir`'s bucketed labels
    * table (bucketing survives only through the catalog). */
  private def tableNameFor(storeDir: String): String =
    "graft_labels_" + java.security.MessageDigest.getInstance("MD5")
      .digest(storeDir.getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString

  /** Run the three stages over `docs`, overwriting `storeDir`. Dials
    * mirror the battery's near-dup defaults (q43/q49): 16 hashes in
    * 4 bands, estimate cut 0.5.
    *
    * `bucketLabels` > 0 writes the labels stage `bucketBy` `idCol`
    * into that many buckets (registered as an external catalog table
    * over `storeDir/labels` — bucketing is catalog metadata). This
    * is the serving layout for the cluster-scale claim above: with
    * the corpus bucketed by the same key and count, a consumer's
    * label join plans with NO exchange on either side
    * (CurationStoreSpec pins the zero-exchange shape). A bucketed
    * store stays MAINTAINABLE: [[update]] folds batches into the
    * plain-parquet delta stage beside the base, [[labelJoin]] keeps
    * consumers exchange-free while the delta is outstanding, and
    * [[compact]] periodically folds the delta back into a fresh
    * bucketed base.
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
      storeDir: String, numHashes: Int = 16, numBands: Int = 4,
      minEst: Double = 0.5,
      maxBucketSize: Long = Long.MaxValue,
      bucketLabels: Int = 0): Store = {
    val spark = docs.sparkSession
    // stage 1 — signatures: one partition-local pass over the text
    // (the only stage that touches the corpus)
    Dedup.minhashSignatures(docs, idCol, textCol, numHashes)
      .write.mode("overwrite").parquet(s"$storeDir/signatures")
    // stage 2 — candidate pairs from the STORED signatures: band
    // bucket self-join + estimate threshold, raw text never re-read
    Dedup.estimatePairsFromSignatures(
        spark.read.parquet(s"$storeDir/signatures"),
        idCol, numHashes, numBands, maxBucketSize)
      .filter(col("est_jaccard") >= minEst)
      .write.mode("overwrite").parquet(s"$storeDir/pairs")
    // stage 3 — cluster labels: the components fixpoint runs ONCE,
    // its write is its materialization, its cache is released here
    val fixpoint = Dedup.clusters(
      spark.read.parquet(s"$storeDir/pairs"), "a", "b")
    val labelRows = fixpoint.select(col("id").as(idCol), col("cluster"))
    val table =
      if (bucketLabels > 0) {
        val name = tableNameFor(storeDir)
        labelRows.write.format("parquet")
          .bucketBy(bucketLabels, idCol).sortBy(idCol)
          .option("path", StoreDirs.catalogSafe(s"$storeDir/labels"))
          .mode("overwrite").saveAsTable(name)
        Some(name)
      } else {
        labelRows.write.mode("overwrite").parquet(s"$storeDir/labels")
        None
      }
    fixpoint.unpersist()
    // a rebuild resets the store wholesale — clear any protocol
    // files from the directory's previous life (stale _applied ids
    // could alias a fresh producer's restarted batch numbering) and
    // any label delta (the fresh base already holds every label)
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    UpdateMarker.clear(fs, storeDir)
    StageSwap.remove(fs,
      new org.apache.hadoop.fs.Path(s"$storeDir/labels_delta"))
    StageSwap.remove(fs,
      new org.apache.hadoop.fs.Path(s"$storeDir/tombstones"))
    val store = Store(storeDir, idCol, table)
    // exact live counter seeded from the fresh signatures (no
    // tombstones exist — unmasked count is the live membership);
    // previous-life staleness state dies with the rebuild
    StageSwap.remove(fs, staleSentinel(store))
    StageSwap.remove(fs,
      new org.apache.hadoop.fs.Path(s"${statsDir(store)}.old"))
    StageSwap.remove(fs,
      new org.apache.hadoop.fs.Path(s"${statsDir(store)}.next"))
    spark.read.parquet(s"$storeDir/signatures")
      .agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(statsDir(store))
    store
  }

  /** Incrementally fold a NEW batch of docs into an existing store —
    * the daily operation at 100 TB, where a full [[build]] would
    * re-shingle the whole corpus to absorb a sliver of new documents.
    * The high-water discipline of the incremental operators (q53's
    * signature store, q67's ANN assignments) applied to the staged
    * pipeline itself:
    *
    *  - signatures: ONLY `newDocs` is shingled and minhashed; the new
    *    rows are APPENDED to the signature stage. History text is
    *    never read.
    *  - pairs: [[Dedup.estimatePairsForNewBatch]] joins the new
    *    signatures against the STORED ones (batch-vs-store +
    *    within-batch, `a < b` normalized) and appends the result —
    *    exactly the pairs a full rebuild would add.
    *  - labels: the components fixpoint re-runs over the SMALL edge
    *    set (stored labels as id→cluster edges ∪ the appended pairs)
    *    — linear in labeled docs + new pairs, independent of corpus
    *    text volume. A new doc bridging two old clusters merges them
    *    correctly because each old cluster id is itself a member
    *    node. On a plain store the result replaces the labels stage
    *    via write-to-temp + rename (a crash never leaves a
    *    half-written stage); on a BUCKETED store the base table is
    *    immutable and the result lands as the labels-that-differ
    *    DELTA beside it (same rename-swap), keeping the serving
    *    layout intact between [[compact]]s.
    *
    * Equivalence `update(build(old), new) == build(old ∪ new)` is
    * exact at the default unguarded dials and spec-proven
    * stage-by-stage (CurationStoreSpec); q126 additionally pins it
    * against the DuckDB oracle, which recomputes the summary from
    * the FULL raw corpus.
    *
    * `newDocs` ids must be disjoint from the stored corpus (the
    * caller's high-water contract, as in [[Dedup.dedupIncremental]]).
    *
    * Crash/re-run discipline: the LABEL swap is the update's commit.
    * An [[UpdateMarker]] written before stage 1 snapshots every
    * stage's file listing, so a re-run after a crash first deletes
    * the crashed attempt's partial signature/pair appends (files not
    * in the snapshot) and rolls back a half-swapped label stage —
    * making the re-run exactly-once instead of double-appending the
    * batch's rows. Passing a `batchId` (non-empty — the empty string
    * is the marker's "no key" encoding) additionally makes a re-run
    * of an already-COMMITTED batch a detected no-op across EVERY
    * crash window: the in-flight marker catches a crash before its
    * own delete, the durable `_applied` record catches a crash
    * between the delete and the caller's acknowledgment. Without
    * one, that window is the caller's re-send risk.
    *
    * SINGLE WRITER per store directory ([[UpdateMarker]] contract):
    * a second concurrent update fails loudly at its marker write.
    */
  def update(store: Store, newDocs: DataFrame, textCol: String,
      numHashes: Int = 16, numBands: Int = 4, minEst: Double = 0.5,
      maxBucketSize: Long = Long.MaxValue,
      batchId: Option[String] = None): Store = {
    val spark = newDocs.sparkSession
    val idCol = store.idCol
    val hconf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(store.dir)
      .getFileSystem(hconf)
    def files(dir: String): Set[String] =
      UpdateMarker.listFiles(fs, dir)
    val sigDir = s"${store.dir}/signatures"
    val pairsDir = s"${store.dir}/pairs"
    val labelsDir = s"${store.dir}/labels"
    // the update's COMMIT stage: the whole labels stage for a plain
    // store, the delta stage beside the bucketed base for a
    // read-optimized one (the base table is immutable between
    // compactions — the delta carries every label that differs)
    val commitDir = stageMap(store)("labels")
    // heal + settle + replay-check + fresh marker: the ONE shared
    // protocol definition ([[UpdateMarker.settle]] via the store's
    // [[settleEntry]]); `labels` is the commit stage, sig/pairs/tombs
    // the append-only sides whose partial files a pre-commit crash
    // leaves behind
    if (settleEntry(spark, fs, store, batchId))
      return store // this very batch already applied — no-op
    // re-adding a DELETED id would collide with its tombstone (masks
    // hide by id) — fail loudly; compact() frees the ids (the
    // TextIndexStore/AnnIndexStore rule)
    store.tombstonesIfAny(spark).foreach { t =>
      require(newDocs.join(t.select(col(idCol)).distinct(),
          Seq(idCol), "left_semi").isEmpty,
        "batch re-adds tombstoned ids — run compact() first (removals " +
          "become physical and the tombstone set clears)")
    }

    // stage 1 — shingle ONLY the batch, append; the before/after file
    // diff recovers the appended rows as a COLUMNAR READ so no stage
    // is ever computed twice (the signature stage is the source of
    // truth from here on, mirroring build()'s lineage cuts)
    val sigBefore = files(sigDir)
    Dedup.minhashSignatures(newDocs, idCol, textCol, numHashes)
      .write.mode("append").parquet(sigDir)
    spark.catalog.refreshByPath(sigDir)
    val sigNewFiles = (files(sigDir) -- sigBefore).toSeq
    val sigNew = spark.read.parquet(sigNewFiles: _*)
    // the stored side is tombstone-masked: a new doc must not pair
    // with a DELETED doc's signature
    val sigOld = store.tombMask(spark,
      spark.read.parquet(sigBefore.toSeq: _*), Seq(idCol))

    // stage 2 — the pairs the batch adds, from stored signatures only
    val pairsBefore = files(pairsDir)
    Dedup.estimatePairsForNewBatch(sigNew, sigOld, idCol, numHashes,
        numBands, maxBucketSize)
      .filter(col("est_jaccard") >= minEst)
      .write.mode("append").parquet(pairsDir)
    spark.catalog.refreshByPath(pairsDir)
    val pairsNew =
      spark.read.parquet((files(pairsDir) -- pairsBefore).toSeq: _*)

    // stage 3 — fixpoint over stored-labels-as-edges + new pairs:
    // the graph is labeled docs + new pairs, NOT the corpus. The
    // stored side is the store's EFFECTIVE label map (plain stage,
    // or bucketed base overridden by the delta)
    val edges = store.labels(spark)
      .select(col(idCol).as("a"), col("cluster").as("b"))
      .unionByName(pairsNew.select(col("a"), col("b")))
    val fixpoint = Dedup.clusters(edges, "a", "b")
    val newLab = fixpoint.select(col("id").as(idCol), col("cluster"))
    val staged = store.labelsTable match {
      case Some(t) =>
        // bucketed store: the base table is immutable — stage only
        // the labels that DIFFER from it (new docs + relabels); the
        // delta REPLACES wholesale (it is itself a fixpoint product,
        // not an append), so its size is bounded by drift since the
        // last compact(), not by update count
        // same catalog fallback as labels()/labelJoin(): inside
        // compact()'s DROP..CREATE window the table is absent — the
        // diff only needs the base's ROWS, so a file scan is fully
        // equivalent here and the scheduled update keeps running
        val base = (if (spark.catalog.tableExists(t)) spark.table(t)
                    else spark.read.parquet(s"${store.dir}/labels"))
          .select(col(idCol), col("cluster").as("_bc"))
        newLab.join(base, Seq(idCol), "left_outer")
          .filter(col("_bc").isNull || col("_bc") =!= col("cluster"))
          .select(col(idCol), col("cluster"))
      case None => newLab
    }
    staged.write.mode("overwrite").parquet(s"$commitDir.next")
    fixpoint.unpersist()
    // the exact-counter fold: prior counter plus the batch's
    // signable-doc count off the appended signature files (one row
    // per doc), fused into the single writeStats job. Applied AFTER
    // the commit under the live marker — a crash between leaves the
    // marker, and settleEntry's sentinel recompute restores
    // exactness before anyone trusts the counter
    val folded = statsPlus(spark, store,
      sigNew.agg(count(lit(1)).as("_dn")))
    StageSwap.swapIn(spark, commitDir)
    writeStats(spark, store, folded)
    // record the committed batch BEFORE dropping the in-flight
    // marker, so at every instant one of the two files names it
    batchId.foreach(UpdateMarker.writeApplied(fs, store.dir, _))
    UpdateMarker.delete(fs, UpdateMarker.markerPath(store.dir))
    store
  }

  /** Remove documents from the store — the takedown/recrawl
    * operation for the curation tier, the inverse of [[update]]'s
    * disjoint-id append. Semantics, stated precisely:
    *
    *  - MEMBERSHIP is exact immediately: the doomed ids land in the
    *    append-only `tombstones` stage, every read masks against it
    *    (labels/labelJoin/signatures/both pair endpoints), and the
    *    commit-stage swap drops their label rows physically (the
    *    whole labels stage on a plain store; the delta beside a
    *    bucketed base, whose base rows the mask covers). No deleted
    *    doc appears in any consumer join, pair report or cluster
    *    from the next query on.
    *  - TOPOLOGY refreshes at [[compact]]: a deleted BRIDGE doc's
    *    transitive merges survive in the remaining docs' cluster
    *    ids until compaction re-resolves components over the
    *    physically filtered pairs — at which point the store equals
    *    a rebuild without the deleted docs stage-for-stage
    *    (spec-pinned at the default unguarded dials, where the LSH
    *    banding of the remaining signatures yields exactly the
    *    stored pairs minus those touching deleted docs).
    *
    * Crash/replay discipline is [[update]]'s verbatim: tombstone
    * appends are a healed side stage, the labels swap is the commit,
    * `batchId` makes every replay window a detected no-op (the
    * `_applied` record additionally witnesses commitment when the
    * swap replaced zero files — an empty delta). Ids already deleted
    * or never stored are ignored.
    */
  def delete(store: Store, ids: DataFrame,
      batchId: Option[String] = None): Store = {
    val spark = ids.sparkSession
    val idCol = store.idCol
    val fs = new org.apache.hadoop.fs.Path(store.dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    if (settleEntry(spark, fs, store, batchId))
      return store // this very batch already applied — no-op
    // append only CURRENTLY-STORED ids: signatures(spark) is the
    // masked membership stage, so an id already tombstoned — or
    // NEVER STORED (a takedown arriving before ingest, a typo'd id)
    // — contributes no tombstone row. Tombstoning a never-stored id
    // would permanently block a later update() of that id behind the
    // re-add guard although no stale rows exist to resurrect (the
    // [[TextIndexStore.delete]] rule; a signable-width doc always
    // has a signatures row, and a sub-shingle-width doc has no rows
    // in ANY stage, so skipping its tombstone masks nothing away).
    // Evaluated at the write below, before the append lands —
    // re-runs cannot grow the set.
    val doomed = ids.select(col(idCol)).distinct()
      .join(store.signatures(spark).select(col(idCol)), Seq(idCol),
        "left_semi")
    val tombBefore = UpdateMarker.listFiles(fs, store.tombDir)
    doomed.write.mode("append").parquet(store.tombDir)
    spark.catalog.refreshByPath(store.tombDir)
    // the counter decrement is EXACTLY the appended tombstone rows,
    // read back off the listing diff — re-evaluating `doomed` now
    // would see the just-masked signatures and count zero
    val tombNew =
      (UpdateMarker.listFiles(fs, store.tombDir) -- tombBefore).toSeq
    val dnNeg = if (tombNew.isEmpty)
        spark.range(1).select(lit(0L).as("_dn"))
      else spark.read.parquet(tombNew: _*)
        .agg((count(lit(1)) * -1).as("_dn"))
    // commit: swap the stage the settle protocol watches — the
    // effective labels minus the deleted docs (labels(spark) is
    // already masked against the just-appended tombstones) on a
    // plain store, the delta minus the deleted docs beside a
    // bucketed base
    val commitDir = stageMap(store)("labels")
    val staged = store.labelsTable match {
      case Some(_) =>
        store.deltaIfAny(spark)
          .map(d => store.tombMask(spark, d, Seq(idCol)))
          .getOrElse {
            // an empty staged delta needs only the labels SCHEMA —
            // taken from the catalog, which carries it even when a
            // re-resolve compact emptied the base to ZERO files
            // (deletion can legitimately empty a stage, the
            // compactReResolve rule; a raw parquet read of a
            // zero-file dir cannot infer a schema)
            store.labelsTable.filter(spark.catalog.tableExists)
              .map(spark.table)
              .getOrElse(spark.read.parquet(s"${store.dir}/labels"))
              .filter(lit(false))
          }
      case None => store.labels(spark)
    }
    staged.write.mode("overwrite").parquet(s"$commitDir.next")
    // exact-counter fold after the commit, under the live marker —
    // the same crash discipline as update()'s, fused into the single
    // writeStats job (the negated tombstone-row count is the delta;
    // the stats read is lazy but resolves files before its own swap)
    val folded = statsPlus(spark, store, dnNeg)
    StageSwap.swapIn(spark, commitDir)
    writeStats(spark, store, folded)
    batchId.foreach(UpdateMarker.writeApplied(fs, store.dir, _))
    UpdateMarker.delete(fs, UpdateMarker.markerPath(store.dir))
    store
  }

  /** Fold the label delta into a fresh BUCKETED base — the periodic
    * maintenance that completes the serving story: [[update]] keeps
    * a bucketed store current through the plain delta stage,
    * `compact` pays the one bucketing shuffle to restore the pure
    * read-optimized layout (delta empty, every consumer join
    * zero-exchange again). Also the upgrade path: compacting a PLAIN
    * store buckets it in place.
    *
    * Crash discipline: the staged bucketed files commit through the
    * same [[StageSwap]] rename protocol as every stage write — a
    * crash mid-compact leaves the old layout readable and a re-run
    * completes. The catalog entry is dropped BEFORE the file commit
    * and re-created after it, so no crash point leaves bucket
    * metadata describing files of a different layout; inside that
    * window (and after any crash in it) `labels()`/`labelJoin()`
    * fall back to scanning the files — correct rows, one extra
    * exchange — and re-invoking `compact` completes the
    * registration. At cluster scale that registration is the
    * metastore update a maintenance window performs, not part of
    * the data path.
    *
    * SINGLE WRITER: compact participates in the [[UpdateMarker]]
    * protocol like [[update]] — it settles a crashed predecessor at
    * entry (healing that update's partial appends BEFORE reading the
    * labels it folds) and holds the in-flight marker for its run, so
    * simultaneous writer entries collide loudly at the fail-if-exists
    * marker write. A writer entering LATER (whose settle consumes the
    * held marker — a marker cannot distinguish crashed from live)
    * still cannot lose labels: the delta removal below is limited to
    * the files this run actually read and folded, so a delta swapped
    * in mid-compaction survives as an outstanding override on the
    * new base (delta rows are absolute (id, cluster) assignments,
    * valid over any base).
    */
  def compact(s: SparkSession, store: Store, buckets: Int): Store = {
    require(buckets > 0, "buckets must be positive")
    val labelsDir = s"${store.dir}/labels"
    val fs = new org.apache.hadoop.fs.Path(store.dir)
      .getFileSystem(s.sessionState.newHadoopConf())
    // compact is a store WRITER and participates in the UpdateMarker
    // single-writer protocol like update(): settle a crashed
    // predecessor (update or compact) — healing its partial appends
    // BEFORE this run reads the labels it folds — then hold the
    // in-flight marker so simultaneous entries collide loudly at the
    // fail-if-exists write. (batchId None: compaction is
    // maintenance, not a batch — it never records `_applied`.)
    settleEntry(s, fs, store, batchId = None)
    // snapshot the delta files THIS run folds: only these are
    // removed after the commit. Even if writer discipline is
    // violated and an update swaps a fresh delta in mid-compact,
    // that delta's files (new names, wholesale replacement) survive
    // as an outstanding override on the new base — delta rows are
    // ABSOLUTE (id, cluster) assignments, valid over any base —
    // rather than being silently deleted with the folded ones.
    val foldedDelta = UpdateMarker.listFiles(fs, store.deltaDir)
    val name = tableNameFor(store.dir)
    val staging = s"${name}_staging"
    if (store.tombstonesIfAny(s).isDefined)
      return compactReResolve(s, fs, store, buckets, foldedDelta,
        labelsDir, name, staging)
    s.sql(s"DROP TABLE IF EXISTS $staging")
    // stage the EFFECTIVE labels (base ∪ delta, or the plain stage)
    // bucketed at labels.next — the read side is untouched while the
    // write runs, the swap below is the commit
    store.labels(s).write.format("parquet")
      .bucketBy(buckets, store.idCol).sortBy(store.idCol)
      .option("path", StoreDirs.catalogSafe(s"$labelsDir.next"))
      .mode("overwrite").saveAsTable(staging)
    s.sql(s"DROP TABLE IF EXISTS $staging") // metadata only; files stay
    // drop the catalog entry BEFORE the file commit: between here
    // and the CREATE below no table exists, so stale bucket
    // metadata can never describe the new files (a crash after the
    // swap with a CHANGED bucket count would otherwise hand
    // consumers a false co-partitioning assumption); readers degrade
    // to the labels()/labelJoin() file-scan fallback — correct rows,
    // one extra exchange — until the re-registration lands
    s.sql(s"DROP TABLE IF EXISTS $name")
    StageSwap.swapIn(s, labelsDir)          // commit point
    // the FOLDED delta files are now in the new base — drop them
    // (and the stage dir when nothing newer landed), then point the
    // store's deterministic table name at the committed files
    // (bucket layout survives only through catalog metadata; the
    // bucket ids ride the part-file names the rename preserved)
    foldedDelta.foreach(f =>
      StageSwap.remove(fs, new org.apache.hadoop.fs.Path(f)))
    if (UpdateMarker.listFiles(fs, store.deltaDir).isEmpty)
      StageSwap.remove(fs, new org.apache.hadoop.fs.Path(store.deltaDir))
    val schema = s.read.parquet(labelsDir).schema.toDDL
    s.sql(s"CREATE TABLE $name ($schema) USING parquet " +
      s"CLUSTERED BY (${store.idCol}) SORTED BY (${store.idCol}) " +
      s"INTO $buckets BUCKETS " +
      s"LOCATION '${StoreDirs.catalogSafe(labelsDir)}'")
    UpdateMarker.delete(fs, UpdateMarker.markerPath(store.dir))
    Store(store.dir, store.idCol, Some(name))
  }

  /** [[compact]]'s deletion-aware path, taken when tombstones are
    * outstanding: removals become PHYSICAL in every stage and the
    * cluster topology refreshes — after it the store equals a
    * rebuild without the deleted docs, stage for stage.
    *
    *  1. signatures and pairs rewrite through their own stage swaps
    *     from the MASKED views (rows of deleted docs dropped);
    *  2. the components fixpoint re-runs over the REMAINING pairs —
    *     the step that splits clusters a deleted bridge doc held
    *     together (reader-side masks alone cannot, which is why the
    *     delete scaladoc defers topology to here);
    *  3. the re-resolved labels land as the fresh bucketed base
    *     (the normal compact's DROP..CREATE catalog discipline);
    *  4. the folded delta and the absorbed tombstone files clear.
    *
    * Crash discipline: the held marker is MAINTENANCE-kind (every
    * listing keyed `.swap` — settlement never heals these stages'
    * listing diffs, which after the committed swaps ARE the new
    * data), ordered so the labels swap commits LAST: [[settleEntry]]
    * rolls an interrupted run BACK (stage recovers; tombstones and
    * delta still outstanding, masks still serving, a re-run
    * completes — the already-swapped sig/pairs rewrites are
    * idempotent no-ops) and rolls a COMMITTED run FORWARD (the
    * `fold`/`tombfold` listings finish clearing, so a stale delta
    * row can never override a re-resolved label and re-deleted ids
    * can never re-mask).
    */
  private def compactReResolve(s: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, store: Store, buckets: Int,
      foldedDelta: Set[String], labelsDir: String, name: String,
      staging: String): Store = {
    val sigDir = s"${store.dir}/signatures"
    val pairsDir = s"${store.dir}/pairs"
    val marker = UpdateMarker.markerPath(store.dir)
    val absorbedTombs = UpdateMarker.listFiles(fs, store.tombDir)
    // swap the settle-held update-shaped marker for the maintenance
    // kind: this run's commits are stage swaps, never appends
    UpdateMarker.delete(fs, marker)
    UpdateMarker.write(fs, marker, UpdateMarker.State("", Map(
      "sig.swap" -> UpdateMarker.listFiles(fs, sigDir),
      "pairs.swap" -> UpdateMarker.listFiles(fs, pairsDir),
      "labels.swap" -> UpdateMarker.listFiles(fs, labelsDir),
      "fold" -> foldedDelta, "tombfold" -> absorbedTombs)))
    // deletion can legitimately EMPTY a stage (every pair touched a
    // deleted doc) — zero-file parquet dirs can't infer a schema, so
    // the rewrites below capture their schemas from the pre-rewrite
    // views and the CREATE below uses the label frame's own schema
    val pairsSchema = store.pairs(s).schema
    // 1. physical removal (masked reads; idempotent on re-run)
    store.signatures(s)
      .write.mode("overwrite").parquet(s"$sigDir.next")
    StageSwap.swapIn(s, sigDir)
    store.pairs(s)
      .write.mode("overwrite").parquet(s"$pairsDir.next")
    StageSwap.swapIn(s, pairsDir)
    // 2. + 3. re-resolve over the remaining pairs, stage bucketed
    val fixpoint = Dedup.clusters(
      s.read.schema(pairsSchema).parquet(pairsDir), "a", "b")
    val labelRows = fixpoint
      .select(col("id").as(store.idCol), col("cluster"))
    val labelSchema = labelRows.schema.toDDL
    s.sql(s"DROP TABLE IF EXISTS $staging")
    labelRows.write.format("parquet")
      .bucketBy(buckets, store.idCol).sortBy(store.idCol)
      .option("path", StoreDirs.catalogSafe(s"$labelsDir.next"))
      .mode("overwrite").saveAsTable(staging)
    s.sql(s"DROP TABLE IF EXISTS $staging") // metadata only
    s.sql(s"DROP TABLE IF EXISTS $name")
    StageSwap.swapIn(s, labelsDir) // the roll-forward commit witness
    fixpoint.unpersist()
    // 4. clear what this run folded; cleanup empty stage dirs
    (foldedDelta ++ absorbedTombs).foreach(f =>
      StageSwap.remove(fs, new org.apache.hadoop.fs.Path(f)))
    for (d <- Seq(store.deltaDir, store.tombDir)) {
      if (UpdateMarker.listFiles(fs, d).isEmpty)
        StageSwap.remove(fs, new org.apache.hadoop.fs.Path(d))
      s.catalog.refreshByPath(d)
    }
    s.sql(s"CREATE TABLE $name ($labelSchema) USING parquet " +
      s"CLUSTERED BY (${store.idCol}) SORTED BY (${store.idCol}) " +
      s"INTO $buckets BUCKETS " +
      s"LOCATION '${StoreDirs.catalogSafe(labelsDir)}'")
    UpdateMarker.delete(fs, marker)
    Store(store.dir, store.idCol, Some(name))
  }

  /** Consumer-side label join that keeps the bucketed store's
    * ZERO-exchange shape even while a delta is outstanding: the big
    * corpus-vs-base join stays exchange-free (both sides bucketed by
    * `idCol`), the delta rides in as two broadcasts — an anti-join
    * masking base rows the delta supersedes, plus the delta rows
    * themselves. Semantically identical to
    * `corpus.join(store.labels(s), idCol)` (CurationStoreSpec pins
    * both the equality and the exchange count); joining the union
    * frame directly would forget the base's bucketing and re-shuffle
    * the corpus.
    */
  def labelJoin(corpus: DataFrame, store: Store): DataFrame = {
    val s = corpus.sparkSession
    val idCol = store.idCol
    // deleted docs leave every serving join immediately (the labels()
    // mask, applied here to the bucketed fast paths too — a broadcast
    // anti-join preserves the base's bucketed partitioning)
    def masked(df: DataFrame): DataFrame = store.tombMask(s, df, Seq(idCol))
    store.labelsTable match {
      // the tableExists guard mirrors labels(): inside compact()'s
      // re-registration window the join degrades to the plain-scan
      // shape (one exchange) instead of failing
      case t if t.filter(s.catalog.tableExists).isEmpty =>
        corpus.join(store.labels(s), idCol)
      case Some(t) =>
        val base = s.table(t)
        store.deltaIfAny(s) match {
          case None => masked(corpus.join(base, idCol))
          case Some(delta) if !deltaBroadcastable(s, store) =>
            // delta outgrew the broadcast ceiling (compact() is
            // overdue): the zero-exchange claim is void either way,
            // so degrade to the one-exchange union shape instead of
            // OOMing a broadcast (see [[DeltaBroadcastMaxBytes]])
            corpus.join(store.labels(s), idCol)
          case Some(delta) =>
            masked(corpus.join(base, idCol)
              .join(broadcast(delta.select(col(idCol))),
                Seq(idCol), "left_anti")
              .unionByName(corpus.join(broadcast(delta), idCol)))
        }
    }
  }

  // ---- session-lifetime store per corpus directory ----------------

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, Store]()

  /** Deterministic local store directory for `dataDir` (+ optional
    * suffix for side-by-side stores, e.g. q126's incremental twin).
    */
  def storeDirFor(dataDir: String, suffix: String = ""): String =
    StoreDirs.dirFor("target/curation-store/", dataDir, suffix)

  /** The memoized store for the `documents` corpus at `dataDir`:
    * built (fresh, mode-overwrite) on first access per JVM, then
    * shared by every consumer query in the session — cluster labels
    * are computed once per corpus, not once per query. Dials are the
    * battery's (16/4/0.5), matching q49's `nearDupPairs`.
    */
  def forCorpus(s: SparkSession, dataDir: String): Store =
    built.computeIfAbsent(dataDir, d =>
      build(s.read.parquet(s"$d/documents.parquet"), "doc_id", "text",
        storeDirFor(d)))

  /** Rebuild `dataDir`'s store unconditionally (the q125 surface:
    * the build cost stays honestly measured in the bench battery
    * even when consumers ride the memoized store).
    */
  def rebuildForCorpus(s: SparkSession, dataDir: String): Store = {
    val st = build(s.read.parquet(s"$dataDir/documents.parquet"),
      "doc_id", "text", storeDirFor(dataDir))
    built.put(dataDir, st)
    st
  }
}
