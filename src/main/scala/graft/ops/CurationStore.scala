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
  * The battery's local stores keep plain parquet, which is what the
  * rename-swap incremental [[update]] maintains.
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
    def signatures(s: SparkSession): DataFrame =
      s.read.parquet(s"$dir/signatures")
    def pairs(s: SparkSession): DataFrame = s.read.parquet(s"$dir/pairs")
    def labels(s: SparkSession): DataFrame =
      labelsTable.map(s.table).getOrElse(s.read.parquet(s"$dir/labels"))
  }

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
    * (CurationStoreSpec pins the zero-exchange shape). The bucketed
    * variant is read-optimized: [[update]] folds batches through the
    * rename-swap discipline plain parquet supports, so an
    * incrementally-maintained store keeps `bucketLabels = 0`.
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
        val name = s"graft_labels_" +
          java.security.MessageDigest.getInstance("MD5")
            .digest(storeDir.getBytes("UTF-8"))
            .take(6).map("%02x".format(_)).mkString
        labelRows.write.format("parquet")
          .bucketBy(bucketLabels, idCol).sortBy(idCol)
          .option("path", s"$storeDir/labels")
          .mode("overwrite").saveAsTable(name)
        Some(name)
      } else {
        labelRows.write.mode("overwrite").parquet(s"$storeDir/labels")
        None
      }
    fixpoint.unpersist()
    Store(storeDir, idCol, table)
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
    *    node. The result replaces the labels stage via
    *    write-to-temp + rename (a crash never leaves a half-written
    *    stage; at cluster scale you'd version the directory like
    *    `EventStream.mergeBatch` and flip a pointer).
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
    * batch's rows. Passing a `batchId` additionally makes a re-run
    * of an already-COMMITTED batch a detected no-op (the
    * committed-but-unacknowledged window); without one, that window
    * is the caller's re-send risk.
    */
  def update(store: Store, newDocs: DataFrame, textCol: String,
      numHashes: Int = 16, numBands: Int = 4, minEst: Double = 0.5,
      maxBucketSize: Long = Long.MaxValue,
      batchId: Option[String] = None): Store = {
    require(store.labelsTable.isEmpty,
      "bucketed stores are the read-optimized serving layout; " +
        "incremental maintenance uses a plain store (bucketLabels=0) " +
        "— rebuild to re-bucket")
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
    // a prior update may have died inside its label swap — heal the
    // stage before reading it, or the re-run fails at the scan below
    StageSwap.recover(spark, labelsDir)
    // settle a crashed predecessor (UpdateMarker protocol): decide
    // commitment off the label stage's listing — rollback restored
    // the snapshotted names, a committed swap replaced them
    val marker = UpdateMarker.markerPath(store.dir)
    UpdateMarker.read(fs, marker).foreach { prior =>
      val committed = files(labelsDir) !=
        prior.listings.getOrElse("labels", Set.empty[String])
      if (!committed) {
        // crashed before the commit: drop the partial appends so the
        // re-run's before/after file diffs start from clean stages
        (files(sigDir) --
          prior.listings.getOrElse("sig", Set.empty[String]))
          .foreach(f => StageSwap.remove(fs,
            new org.apache.hadoop.fs.Path(f)))
        (files(pairsDir) --
          prior.listings.getOrElse("pairs", Set.empty[String]))
          .foreach(f => StageSwap.remove(fs,
            new org.apache.hadoop.fs.Path(f)))
        spark.catalog.refreshByPath(sigDir)
        spark.catalog.refreshByPath(pairsDir)
      }
      UpdateMarker.delete(fs, marker)
      if (committed && batchId.isDefined && prior.batchId == batchId.get)
        return store // this very batch already applied — no-op
    }
    UpdateMarker.write(fs, marker, UpdateMarker.State(
      batchId.getOrElse(""),
      Map("sig" -> files(sigDir), "pairs" -> files(pairsDir),
        "labels" -> files(labelsDir))))

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
    val sigOld = spark.read.parquet(sigBefore.toSeq: _*)

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
    // the graph is labeled docs + new pairs, NOT the corpus
    val edges = spark.read.parquet(labelsDir)
      .select(col(idCol).as("a"), col("cluster").as("b"))
      .unionByName(pairsNew.select(col("a"), col("b")))
    val fixpoint = Dedup.clusters(edges, "a", "b")
    fixpoint.select(col("id").as(idCol), col("cluster"))
      .write.mode("overwrite").parquet(s"$labelsDir.next")
    fixpoint.unpersist()
    StageSwap.swapIn(spark, labelsDir)
    UpdateMarker.delete(fs, marker)
    store
  }

  // ---- session-lifetime store per corpus directory ----------------

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, Store]()

  /** Deterministic local store directory for `dataDir` (+ optional
    * suffix for side-by-side stores, e.g. q126's incremental twin).
    */
  def storeDirFor(dataDir: String, suffix: String = ""): String = {
    // sanitizing collapses punctuation runs, so distinct corpora
    // (/data/a-b vs /data/a/b) could alias one subdir and overwrite
    // each other's staged parquet — a short digest of the FULL path
    // keeps the name readable and the mapping injective
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(dataDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map(b => f"$b%02x").mkString
    "target/curation-store/" +
      dataDir.replaceAll("[^A-Za-z0-9.]+", "_").stripPrefix("_") +
      s"-$digest$suffix"
  }

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
