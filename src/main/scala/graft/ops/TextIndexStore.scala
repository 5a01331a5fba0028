package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The BM25 side of retrieval as a PERSISTED index — the sparse twin
  * of [[AnnIndexStore]], closing the other half of the hybrid
  * serving story: q75/q134/q146 recompute term frequencies, document
  * lengths and corpus stats from the raw text inside every plan,
  * which keeps the whole stack inside one oracle hash but re-pays
  * the corpus tokenization per query batch. A deployed service
  * tokenizes ONCE into three stages under one directory:
  *
  *  - `postings` (token, idCol, tf, positions) — the
  *    full-vocabulary POSITIONAL inverted rows, written sorted by
  *    token so a term query's `token IN (...)` pushes into the
  *    parquet scan and row-group stats prune the untouched
  *    vocabulary; the sorted 0-based occurrence positions power
  *    [[phraseMatch]] and cost one int per token occurrence that
  *    bm25/matchAll scans never read (columnar pruning). At cluster scale this
  *    stage is bucketed BY TOKEN through the catalog —
  *    [[build]]'s `bucketPostings` dial, the [[CurationStore]]
  *    labels discipline made real for the text tier: a term probe
  *    prunes to its BUCKETS (SelectedBucketsCount in the scan) and
  *    the scoring kernel's token-keyed aggregation plans with NO
  *    exchange on the postings side, because the bucketed scan
  *    itself reports the token hash distribution. Maintenance and
  *    the read-optimized layout compose: [[update]] appends batches
  *    to the plain `postings_delta` stage beside the immutable
  *    base, readers serve base ∪ delta (exact — batch ids are
  *    disjoint, so the union never double-counts), [[compact]]
  *    folds the delta back into a fresh bucketed base. The
  *    battery's local stores keep plain sorted parquet and the
  *    pushed filter; the spec pins both layouts.
  *  - `doclens` (idCol, dl) — append-only.
  *  - `stats` (n, sumdl) — ONE row of exact integer counters, the
  *    swap-commit stage: an update folds the batch in additively
  *    (disjoint-id contract), and because both counters are exact
  *    BIGINTs the updated stats equal a full rebuild's EXACTLY —
  *    idf and avgdl follow, so incremental maintenance is
  *    bit-identical to rebuilding (q159 pins it through the full
  *    oracle).
  *
  * [[bm25]] scores any term set from the stored stages through the
  * SAME kernel as the from-corpus path ([[TextOps.bm25ScoreFrames]]
  * — one definition, so the two cannot drift); [[compact]] folds
  * the per-update small files back to the token-sorted layout.
  * Crash/replay discipline is [[UpdateMarker.settle]]'s swap-commit
  * protocol verbatim (stats is the commit stage, postings/doclens
  * the append-only sides healed on a pre-commit crash; `batchId`
  * makes committed-but-unacknowledged replays detected no-ops;
  * compact's `.swap` maintenance marker is settled without data-file
  * healing). SINGLE WRITER per store directory — the standing caveat
  * applies.
  */
object TextIndexStore {

  /** `postingsBuckets` > 0 marks the postings base as BUCKETED BY
    * TOKEN through the catalog ([[build]]'s dial): bucket layout
    * survives only as catalog metadata, so the base reads as a table
    * when registered, with a file-scan fallback inside [[compact]]'s
    * re-registration window (correct rows, layout property lost —
    * the [[CurationStore.Store.labels]] discipline). A bucketed
    * store stays maintainable: [[update]] appends batches to the
    * plain `postings_delta` stage beside the immutable base, readers
    * serve base ∪ delta, [[compact]] folds the delta back into a
    * fresh bucketed base.
    */
  final case class Index(dir: String, idCol: String,
      postingsBuckets: Int = 0) {
    def postingsTable: Option[String] =
      if (postingsBuckets > 0) Some(TextIndexStore.tableNameFor(dir))
      else None

    def deltaDir: String = s"$dir/postings_delta"

    private[ops] def deltaIfAny(s: SparkSession): Option[DataFrame] = {
      val p = new Path(deltaDir)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(p) && UpdateMarker.listFiles(fs, deltaDir).nonEmpty)
        Some(s.read.parquet(deltaDir))
      else None
    }

    /** The postings BASE — the bucketed table when registered, the
      * files otherwise. Kept separate from [[postings]] so a
      * no-delta read stays a single table scan (a union node would
      * forget the bucketing and re-shuffle every token aggregation).
      */
    private[ops] def postingsBase(s: SparkSession): DataFrame =
      postingsTable.filter(s.catalog.tableExists).map(s.table)
        .getOrElse(s.read.parquet(s"$dir/postings"))

    def tombDir: String = s"$dir/tombstones"

    private[ops] def tombstonesIfAny(s: SparkSession): Option[DataFrame] =
      Tombstones.ifAny(s, tombDir)

    /** Drop tombstoned documents' rows from a per-document stage —
      * how [[TextIndexStore.delete]] serves EXACTLY between
      * compactions: the deleted docs' postings/doclens rows are
      * masked at read time (the shared [[Tombstones.mask]] —
      * broadcast anti-join while the set is small, the
      * degrade-don't-OOM rule past [[TombBroadcastMaxBytes]]) and
      * the stats counters were decremented exactly at delete time,
      * so every score equals a rebuild without those docs;
      * [[TextIndexStore.compact]] makes the removal physical and
      * clears the tombstones.
      */
    private def masked(s: SparkSession, df: DataFrame): DataFrame =
      Tombstones.mask(s, df, idCol, tombDir,
        TextIndexStore.TombBroadcastMaxBytes,
        TextIndexStore.tombBroadcastDefault, Seq(idCol))

    /** Every LIVE postings row: (base ∪ outstanding delta) minus
      * tombstoned docs. Postings are per-document derivations with
      * DISJOINT ids across batches, so the union is exact (no
      * override semantics needed — unlike [[CurationStore]] labels,
      * nothing in the delta supersedes a base row). */
    def postings(s: SparkSession): DataFrame =
      masked(s, deltaIfAny(s) match {
        case None => postingsBase(s)
        case Some(d) => postingsBase(s).unionByName(d)
      })
    def doclens(s: SparkSession): DataFrame =
      masked(s, s.read.parquet(s"$dir/doclens"))
    def stats(s: SparkSession): DataFrame =
      s.read.parquet(s"$dir/stats")
  }

  /** Ceiling (bytes of tombstone parquet) up to which the deleted-id
    * mask rides reads as a BROADCAST; past it readers degrade to the
    * shuffle anti-join instead of OOMing. Hitting it means
    * [[compact]] is overdue (compaction makes removals physical and
    * empties the set). */
  val TombBroadcastMaxBytes = "spark.graft.text.tombBroadcastMaxBytes"
  private[ops] val tombBroadcastDefault = 32L * 1024 * 1024

  private[ops] def tombBroadcastable(s: SparkSession,
      idx: Index): Boolean =
    Tombstones.broadcastable(s, idx.tombDir, TombBroadcastMaxBytes,
      tombBroadcastDefault)

  /** Deterministic catalog name for `storeDir`'s bucketed postings
    * table (bucketing survives only through the catalog) — the
    * [[CurationStore]] naming scheme, separate prefix. */
  private[ops] def tableNameFor(storeDir: String): String =
    "graft_postings_" + java.security.MessageDigest.getInstance("MD5")
      .digest(storeDir.getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString

  /** The [[UpdateMarker]] stage map all writers share — the append
    * target for postings is the DELTA stage on a bucketed store (the
    * base is immutable between compactions). */
  private def stageMap(idx: Index): Map[String, String] = Map(
    "postings" -> (if (idx.postingsBuckets > 0) idx.deltaDir
                   else s"${idx.dir}/postings"),
    "doclens" -> s"${idx.dir}/doclens",
    "tombs" -> idx.tombDir,
    "stats" -> s"${idx.dir}/stats")

  /** Hot-token write salt — the text tier's document-frequency
    * policy (the [[Dedup]] `maxDocFreq` concern, answered at the
    * LAYOUT level so scores never change): `repartition(token)`
    * alone puts each token's ENTIRE postings list in one task and
    * one file, and a stopword's postings are corpus-scale — the hot
    * token is both the write straggler and a monster row-group any
    * query containing a common term must scan in one split. Salting
    * the shuffle key by `hash(id) % salt` bounds the hot token's
    * task/file fan-in to `salt` ways while keeping files
    * token-sorted (row-group probe pruning intact — a probed term
    * now matches row groups in at most `salt` files instead of 1).
    * Pure layout: rows and every score are byte-identical at any
    * salt (spec-pinned on a planted-stopword corpus).
    */
  val PostingsSalt = "spark.graft.text.postingsSalt"
  private val postingsSaltDefault = 4

  private def saltOf(s: SparkSession): Int =
    s.conf.get(PostingsSalt, postingsSaltDefault.toString).toInt

  /** One definition of the postings write layout (build, update and
    * compact must shuffle identically or the incremental-equivalence
    * and pure-rewrite arguments break). */
  private def writePostings(rows: DataFrame, idCol: String,
      dir: String, mode: String): Unit = {
    val s = rows.sparkSession
    rows
      .repartition(col("token"), pmod(hash(col(idCol)), lit(saltOf(s))))
      .sortWithinPartitions("token")
      .write.mode(mode).parquet(dir)
    s.catalog.refreshByPath(dir)
  }

  /** Per-document term frequencies AND positions for one batch — the
    * ONLY pass that touches text: the doc-length is Σ tf over the
    * doc's postings (the tokenizer keeps empties, so every doc has
    * ≥ 1 token row), and the corpus counters aggregate off the
    * narrow doclens stage. Shared by [[build]] and [[update]] so the
    * two tokenize identically. A NULL text indexes as the empty
    * string (one empty-token row), so such docs still get a doclens
    * row and the stats counters keep counting them — matching the
    * from-corpus kernel, which counts every document.
    *
    * The postings are POSITIONAL: each row carries the token's
    * 0-based occurrence positions, SORTED so the row is a
    * deterministic function of the document (collect_list order is
    * shuffle-scheduled — without the sort, update == rebuild would
    * hold semantically but not bit-for-bit). This is the standard
    * inverted-index trade: one int per token OCCURRENCE (≈ doubles
    * postings bytes) buys phrase/proximity queries ([[phraseMatch]]);
    * bm25/matchAll readers never deserialize the column (columnar
    * projection prunes it), so scoring scans stay narrow.
    */
  private def tfRows(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol), posexplode(TextOps.tokens(
        coalesce(col(textCol), lit("")))).as(Seq("pos", "token")))
      .groupBy(idCol, "token").agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))
      .select(col("token"), col(idCol), col("tf"), col("positions"))

  /** (idCol, dl) derived from a postings frame — a columnar read,
    * never a re-tokenize. */
  private def dlOf(postings: DataFrame, idCol: String): DataFrame =
    postings.groupBy(idCol).agg(sum("tf").as("dl"))

  /** Heal the directory's crash state: roll back any half-swapped
    * stage (a crashed [[compact]] — [[StageSwap]] owns those), ROLL
    * FORWARD a bucketed compact that committed its postings swap but
    * died before removing the delta files it folded (the one window
    * where base ∪ delta would DOUBLE-COUNT rows — the marker's
    * `fold` listing names exactly the files to finish removing;
    * commitment is witnessed by the postings listing differing from
    * the `.swap` snapshot, the [[UpdateMarker.settle]] rule), then
    * settle a crashed writer's marker through [[UpdateMarker.settle]]
    * (maintenance markers are never healed by file deletion — the
    * `.swap` decision table).
    */
  private def settleEntry(s: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, idx: Index,
      batchId: Option[String]): Boolean = {
    val dir = idx.dir
    StageSwap.recover(s, s"$dir/postings")
    StageSwap.recover(s, s"$dir/doclens")
    val marker = UpdateMarker.markerPath(dir)
    UpdateMarker.read(fs, marker)
      .filter(_.listings.contains("postings.swap")).foreach { prior =>
        val committed =
          UpdateMarker.listFiles(fs, s"$dir/postings") !=
            prior.listings("postings.swap")
        if (committed) {
          prior.listings.getOrElse("fold", Set.empty[String])
            .foreach(f => StageSwap.remove(fs, new Path(f)))
          if (UpdateMarker.listFiles(fs, idx.deltaDir).isEmpty)
            StageSwap.remove(fs, new Path(idx.deltaDir))
          s.catalog.refreshByPath(idx.deltaDir)
        }
        // either way the marker is spent: committed → folded files
        // finished above; uncommitted → recover() already rolled the
        // half-swap back and the delta is still the live data
        UpdateMarker.delete(fs, marker)
      }
    UpdateMarker.settle(s, fs, dir, "stats", stageMap(idx), batchId)
  }

  /** Run the one text pass over `docs` and write the store under
    * `dir` (overwrite). `bucketPostings` > 0 writes the postings
    * base BUCKETED BY TOKEN into that many buckets, registered as an
    * external catalog table — the cluster-scale serving layout: a
    * term probe prunes to its buckets (catalog bucket pruning over
    * the `token IN (...)` predicate) and every token-keyed
    * aggregation in the scoring kernel plans with NO exchange on the
    * postings side, because the scan itself reports the token hash
    * distribution (spec-pinned). The battery's local stores keep
    * plain sorted parquet and the pushed filter.
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
      dir: String, bucketPostings: Int = 0): Index = {
    val s = docs.sparkSession
    val fs = new Path(dir)
      .getFileSystem(s.sessionState.newHadoopConf())
    // a rebuild resets the store wholesale — settle the directory's
    // previous life FIRST (the AnnIndexStore.build discipline): a
    // crashed update's stats.old would survive the overwrite below
    // and a later writer's recover would roll the FRESH counters
    // back to the previous corpus's; a stale marker/_applied could
    // heal fresh files away or alias a new producer's batch ids;
    // a previous life's delta or catalog entry would shadow the
    // fresh base
    for (st <- Seq("postings", "doclens", "stats"))
      StageSwap.recover(s, s"$dir/$st")
    UpdateMarker.clear(fs, dir)
    s.sql(s"DROP TABLE IF EXISTS ${tableNameFor(dir)}")
    StageSwap.remove(fs, new Path(s"$dir/postings_delta"))
    StageSwap.remove(fs, new Path(s"$dir/tombstones"))
    // the ONE text pass; doclens and the counters are columnar
    // derivations of the just-written postings (lineage cut at the
    // store boundary, the AnnIndexStore.writeCodes discipline)
    val rows = tfRows(docs, idCol, textCol)
    if (bucketPostings > 0)
      writePostingsBucketed(rows, idCol, bucketPostings,
        tableNameFor(dir), path = s"$dir/postings")
    else
      writePostings(rows, idCol, s"$dir/postings", mode = "overwrite")
    val idx = Index(dir, idCol, bucketPostings)
    dlOf(idx.postings(s), idCol)
      .write.mode("overwrite").parquet(s"$dir/doclens")
    s.catalog.refreshByPath(s"$dir/doclens")
    idx.doclens(s).agg(count(lit(1)).as("n"), sum("dl").as("sumdl"))
      .write.mode("overwrite").parquet(s"$dir/stats")
    idx
  }

  /** The bucketed postings write — one definition for [[build]]
    * (directly at the base path) and [[compact]] (staged at `.next`):
    * bucketBy(token) + sortBy(token) through the catalog, with the
    * same hot-token salt pre-shuffle as the plain layout (the hot
    * bucket's files then come from `salt` tasks instead of one
    * straggler). */
  private def writePostingsBucketed(rows: DataFrame, idCol: String,
      buckets: Int, table: String, path: String): Unit = {
    val s = rows.sparkSession
    rows
      .repartition(col("token"), pmod(hash(col(idCol)), lit(saltOf(s))))
      .write.format("parquet")
      .bucketBy(buckets, "token").sortBy("token")
      .option("path", StoreDirs.catalogSafe(path))
      .mode("overwrite").saveAsTable(table)
  }

  /** Fold a new doc batch in: postings/doclens append THEIR rows
    * only (per-document derivations — a full rebuild would produce
    * exactly these rows for these ids), stats fold additively and
    * commit through the stage swap. One text pass: the batch's
    * doclens/counters derive from its just-appended postings files
    * (before/after listing diff, the [[CurationStore.update]]
    * trick). Ids must be disjoint from the stored corpus. On a
    * BUCKETED store the batch lands in the plain delta stage beside
    * the immutable base — same rows, deferred layout; [[compact]]
    * folds it in.
    */
  def update(idx: Index, newDocs: DataFrame, textCol: String,
      batchId: Option[String] = None): Index = {
    val s = newDocs.sparkSession
    val fs = new Path(idx.dir)
      .getFileSystem(s.sessionState.newHadoopConf())
    if (settleEntry(s, fs, idx, batchId))
      return idx // this very batch already applied — no-op
    // re-adding a DELETED id would collide with its tombstone: the
    // mask hides rows by id, so the re-added doc's rows would vanish
    // from every read (and un-tombstoning instead would resurrect
    // the old rows still physically present). Fail loudly — compact
    // makes removals physical and clears the set, after which the
    // id is genuinely free again. The probe is one tiny job against
    // the tombstone set and only runs while deletions are
    // outstanding.
    idx.tombstonesIfAny(s).foreach { t =>
      require(newDocs.join(t.select(col(idx.idCol)).distinct(),
          Seq(idx.idCol), "left_semi").isEmpty,
        "batch re-adds tombstoned ids — run compact() first (removals " +
          "become physical and the tombstone set clears)")
    }
    val pDir = stageMap(idx)("postings")
    val before = UpdateMarker.listFiles(fs, pDir)
    writePostings(tfRows(newDocs, idx.idCol, textCol), idx.idCol,
      pDir, mode = "append")
    val newFiles = (UpdateMarker.listFiles(fs, pDir) -- before).toSeq
    val batchDl =
      if (newFiles.isEmpty) // an empty batch appends no files
        s.emptyDataFrame.select(lit(0L).as(idx.idCol), lit(0L).as("dl"))
          .limit(0)
      else dlOf(s.read.parquet(newFiles: _*), idx.idCol)
    batchDl.write.mode("append").parquet(s"${idx.dir}/doclens")
    s.catalog.refreshByPath(s"${idx.dir}/doclens")
    val batchStats = batchDl.agg(count(lit(1)).as("_bn"),
      coalesce(sum("dl"), lit(0L)).as("_bsum"))
    idx.stats(s).crossJoin(batchStats)
      .select((col("n") + col("_bn")).as("n"),
        (col("sumdl") + col("_bsum")).as("sumdl"))
      .write.mode("overwrite").parquet(s"${idx.dir}/stats.next")
    StageSwap.swapIn(s, s"${idx.dir}/stats")
    batchId.foreach(UpdateMarker.writeApplied(fs, idx.dir, _))
    UpdateMarker.delete(fs, UpdateMarker.markerPath(idx.dir))
    idx
  }

  /** Remove documents from the index — the operation a real corpus
    * needs (recrawl replacement, takedowns, right-to-be-forgotten)
    * and the inverse of [[update]]'s disjoint-id append. Serving is
    * EXACT immediately: the doomed ids land in the append-only
    * `tombstones` stage (reads mask per-document rows against it —
    * [[Index.masked]]) and the corpus counters are decremented by
    * the deleted docs' exact doclens contributions through the same
    * stats swap-commit as [[update]] — so n, avgdl, every idf and
    * every BM25 score equal a rebuild WITHOUT those docs,
    * bit-for-bit, before any rewrite happens (spec-pinned; the
    * physical removal is [[compact]]'s job, which then clears the
    * tombstones). Ids not currently indexed, or already deleted,
    * are ignored (the guard also makes a keyless re-run decrement
    * exactly once). Same crash protocol as update: tombstone
    * appends are the healed side stages, the stats swap is the
    * commit, `batchId` makes every replay window a detected no-op.
    */
  def delete(idx: Index, ids: DataFrame,
      batchId: Option[String] = None): Index = {
    val s = ids.sparkSession
    val fs = new Path(idx.dir)
      .getFileSystem(s.sessionState.newHadoopConf())
    if (settleEntry(s, fs, idx, batchId))
      return idx // this very batch already applied — no-op
    // only CURRENTLY-LIVE ids count: doclens(s) is the masked view,
    // so an id already tombstoned (or never indexed) contributes
    // neither a tombstone row nor a counter decrement
    val doomed = ids.select(col(idx.idCol)).distinct()
      .join(idx.doclens(s), Seq(idx.idCol), "left_semi")
    val tDir = idx.tombDir
    val before = UpdateMarker.listFiles(fs, tDir)
    doomed.write.mode("append").parquet(tDir)
    s.catalog.refreshByPath(tDir)
    val newFiles = (UpdateMarker.listFiles(fs, tDir) -- before).toSeq
    // decrement by EXACTLY the appended set's doclens rows (read
    // back from the just-written files — the update() lineage cut),
    // against the PRE-APPEND doclens view: the fresh tombstones
    // already mask those rows, so the raw stage is joined here
    val removed =
      if (newFiles.isEmpty)
        s.range(1).select(lit(0L).as("_rn"), lit(0L).as("_rsum"))
      else
        s.read.parquet(s"${idx.dir}/doclens")
          .join(s.read.parquet(newFiles: _*), Seq(idx.idCol),
            "left_semi")
          .agg(count(lit(1)).as("_rn"),
            coalesce(sum("dl"), lit(0L)).as("_rsum"))
    idx.stats(s).crossJoin(removed)
      .select((col("n") - col("_rn")).as("n"),
        (col("sumdl") - col("_rsum")).as("sumdl"))
      .write.mode("overwrite").parquet(s"${idx.dir}/stats.next")
    StageSwap.swapIn(s, s"${idx.dir}/stats")
    batchId.foreach(UpdateMarker.writeApplied(fs, idx.dir, _))
    UpdateMarker.delete(fs, UpdateMarker.markerPath(idx.dir))
    idx
  }

  /** Fold the per-[[update]] small files back into token-sorted
    * postings (and refolded doclens) — the [[AnnIndexStore.compact]]
    * maintenance for the sparse tier: each update appends its own
    * token-sorted files, so probe row-group pruning decays and file
    * counts grow with batch count until this rewrite. Pure rewrite:
    * rows and every score are unchanged (spec-pinned). Stages commit
    * one at a time through [[StageSwap.swapIn]]; the held marker's
    * `.swap` listings mark it as MAINTENANCE, so a crash at ANY
    * point — including after a committed stage swap but before the
    * marker delete — settles without healing a single data file
    * (the [[UpdateMarker.settle]] decision table; the naive
    * listing-diff heal would empty the freshly compacted stage).
    */
  def compact(s: SparkSession, idx: Index): Index = {
    val fs = new Path(idx.dir)
      .getFileSystem(s.sessionState.newHadoopConf())
    settleEntry(s, fs, idx, batchId = None)
    val marker = UpdateMarker.markerPath(idx.dir)
    // settle leaves a held UPDATE-shaped marker; this run's marker
    // must be the MAINTENANCE kind (a crash of ours must never be
    // settled by data-file healing) — swap it for the .swap form.
    // On a bucketed store the marker additionally lists the delta
    // files THIS run folds (`fold`): a crash after the committed
    // postings swap but before the delta removal would otherwise
    // leave base ∪ delta double-counting those rows forever —
    // settleEntry's roll-forward finishes the removal from the
    // listing. Only the folded files are removed (the
    // [[CurationStore.compact]] rule), so a delta appended by a
    // discipline-violating concurrent update survives as
    // outstanding rows over the new base.
    UpdateMarker.delete(fs, marker)
    val foldedDelta =
      if (idx.postingsBuckets > 0)
        UpdateMarker.listFiles(fs, idx.deltaDir)
      else Set.empty[String]
    // tombstoned docs: the rewrites below read the MASKED views, so
    // the removal becomes physical here; the tombstone files this
    // run absorbed (snapshot — a discipline-violating concurrent
    // delete's files survive as outstanding masks) clear after the
    // last stage commits. A crash before the clear is harmless: a
    // tombstone for a row no longer present masks nothing, and the
    // next compact clears it.
    val absorbedTombs = UpdateMarker.listFiles(fs, idx.tombDir)
    UpdateMarker.write(fs, marker, UpdateMarker.State("", Map(
      "postings.swap" -> UpdateMarker.listFiles(fs, s"${idx.dir}/postings"),
      "doclens.swap" -> UpdateMarker.listFiles(fs, s"${idx.dir}/doclens"))
      ++ (if (idx.postingsBuckets > 0) Map("fold" -> foldedDelta)
          else Map.empty)))
    if (idx.postingsBuckets > 0) {
      // stage the folded bucketed base at postings.next through a
      // throwaway catalog name, then commit via the swap; the real
      // table entry is dropped BEFORE the commit so stale bucket
      // metadata can never describe files of a different layout —
      // readers ride the file-scan fallback (correct rows, one
      // extra exchange) until the re-registration below lands
      val name = tableNameFor(idx.dir)
      val staging = s"${name}_staging"
      s.sql(s"DROP TABLE IF EXISTS $staging")
      writePostingsBucketed(idx.postings(s), idx.idCol,
        idx.postingsBuckets, staging, path = s"${idx.dir}/postings.next")
      s.sql(s"DROP TABLE IF EXISTS $staging") // metadata only
      s.sql(s"DROP TABLE IF EXISTS $name")
      StageSwap.swapIn(s, s"${idx.dir}/postings") // commit point
      foldedDelta.foreach(f => StageSwap.remove(fs, new Path(f)))
      if (UpdateMarker.listFiles(fs, idx.deltaDir).isEmpty)
        StageSwap.remove(fs, new Path(idx.deltaDir))
      s.catalog.refreshByPath(idx.deltaDir)
      val schema = s.read.parquet(s"${idx.dir}/postings").schema.toDDL
      s.sql(s"CREATE TABLE $name ($schema) USING parquet " +
        s"CLUSTERED BY (token) SORTED BY (token) " +
        s"INTO ${idx.postingsBuckets} BUCKETS " +
        s"LOCATION '${StoreDirs.catalogSafe(s"${idx.dir}/postings")}'")
    } else {
      idx.postings(s)
        .repartition(col("token"),
          pmod(hash(col(idx.idCol)), lit(saltOf(s))))
        .sortWithinPartitions("token")
        .write.mode("overwrite").parquet(s"${idx.dir}/postings.next")
      StageSwap.swapIn(s, s"${idx.dir}/postings")
    }
    // doclens is CORPUS-cardinality (one row per document) — a
    // single-file fold would serialize billions of narrow rows
    // through one task at scale; repartition by id keeps the fold
    // parallel and the file count bounded by the shuffle setting.
    // (The one-row `stats` stage is the only stage where a
    // single-file shape matters, and it is written that way by the
    // one-row aggregate itself.)
    idx.doclens(s).repartition(col(idx.idCol))
      .write.mode("overwrite").parquet(s"${idx.dir}/doclens.next")
    StageSwap.swapIn(s, s"${idx.dir}/doclens")
    absorbedTombs.foreach(f => StageSwap.remove(fs, new Path(f)))
    if (UpdateMarker.listFiles(fs, idx.tombDir).isEmpty)
      StageSwap.remove(fs, new Path(idx.tombDir))
    s.catalog.refreshByPath(idx.tombDir)
    UpdateMarker.delete(fs, marker)
    idx
  }

  /** Score every stored document against `terms` — (idCol, score),
    * the q75 contract, from the stored stages only: the corpus text
    * is never touched, the postings scan reads the probed terms'
    * row groups, and the scoring math is the shared kernel.
    */
  def bm25(s: SparkSession, idx: Index, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val tf = idx.postings(s).filter(col("token").isin(terms: _*))
      .select(col(idx.idCol), col("token"), col("tf"))
    val stats = idx.stats(s)
      .select(col("n").as("_n"),
        (col("sumdl") / col("n")).as("_avgdl"))
    TextOps.bm25ScoreFrames(tf, idx.doclens(s), stats, idx.idCol,
      terms, k1, b)
  }

  /** FILTERED serving — [[bm25]] restricted to the documents whose
    * ids are in `allowed` (one column named `idCol`): the
    * "search within lang = 'en' / source = wiki" shape, the sparse
    * twin of [[AnnIndexStore.searchFiltered]]. The same frozen-models
    * contract: n, avgdl and every idf stay CORPUS-WIDE (df is a
    * collection statistic — the mask restricts the candidate set,
    * not the model), so an allowed doc's score is bit-identical to
    * its unfiltered [[bm25]] score. BM25 is per-document independent,
    * which makes that equality checkable (unlike filtered ANN, where
    * a pre-filter changes which k fill) — the engine-side point of
    * the pre-filter is COST: the allowed-id semi-join lands on the
    * probed postings rows BEFORE the doclens join and the pivot, so
    * the scoring pipeline processes allowed docs only, while the
    * idf aggregate still reads just the probed terms' row groups
    * (token pushdown binds before the mask). AQE picks the
    * semi-join's build side; a forced broadcast would OOM on a
    * corpus-scale allow-list (the [[TombBroadcastMaxBytes]] lesson).
    */
  def bm25Filtered(s: SparkSession, idx: Index, terms: Seq[String],
      allowed: DataFrame, k1: Double = 1.2, b: Double = 0.75)
      : DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val tfAll = idx.postings(s).filter(col("token").isin(terms: _*))
      .select(col(idx.idCol), col("token"), col("tf"))
    val stats = idx.stats(s)
      .select(col("n").as("_n"),
        (col("sumdl") / col("n")).as("_avgdl"))
    val idf = TextOps.bm25Idf(tfAll, stats)
    val tf = tfAll.join(allowed.select(col(idx.idCol)).distinct(),
      Seq(idx.idCol), "left_semi")
    TextOps.bm25ScoreWithIdf(tf, idx.doclens(s), stats, idf,
      idx.idCol, terms, k1, b)
  }

  /** Conjunctive (boolean AND) retrieval — the documents containing
    * EVERY term in `terms`, with the matched terms' total tf:
    * (idCol, tf_sum). The boolean-retrieval primitive that fronts a
    * ranked stage in real services ("must contain all query terms,
    * then rank"); from the stored postings it is ONE aggregate over
    * the probed terms' rows — the scan reads only those row groups
    * (token-sorted files / bucketed catalog table, pushed IN filter),
    * the groupBy key is the doc id (never a corpus-wide hot key:
    * a doc matches each term once, so group size ≤ |terms|), and the
    * HAVING is a countDistinct == |terms| post-aggregate. Distinct
    * because a (id, token) postings row is unique by construction —
    * countDistinct here is belt-and-braces against a delta overlap
    * bug, not a semantic need.
    */
  def matchAll(s: SparkSession, idx: Index, terms: Seq[String])
      : DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    idx.postings(s).filter(col("token").isin(terms: _*))
      .groupBy(col(idx.idCol))
      .agg(sum("tf").as("tf_sum"),
        countDistinct(col("token")).as("_nt"))
      .filter(col("_nt") === terms.distinct.size)
      .select(col(idx.idCol), col("tf_sum"))
  }

  /** Exact PHRASE retrieval from the positional postings — the
    * documents containing `phrase` as CONSECUTIVE tokens, with the
    * occurrence count: (idCol, hits). Slot i of the phrase
    * contributes its term's occurrence positions shifted back by i
    * (`start = pos - i`), and a phrase occurrence is a (doc, start)
    * every slot agrees on — |phrase| − 1 equi-joins on (id, start)
    * over the PROBED terms' rows only (the scan reads just those
    * terms' row groups, the matchAll pruning), each join keyed by
    * (doc, position) so no corpus-wide hot key exists at any scale.
    * Duplicate terms in the phrase ("batch batch") work unchanged:
    * the same postings row feeds both slots at different shifts.
    * Tombstones mask through [[Index.postings]] underneath.
    */
  def phraseMatch(s: SparkSession, idx: Index, phrase: Seq[String])
      : DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val probed = idx.postings(s)
      .filter(col("token").isin(phrase.distinct: _*))
    val slots = phrase.zipWithIndex.map { case (t, i) =>
      probed.filter(col("token") === t)
        .select(col(idx.idCol), explode(col("positions")).as("_p"))
        .select(col(idx.idCol), (col("_p") - i).as("start"))
    }
    slots.reduce((a, b) => a.join(b, Seq(idx.idCol, "start")))
      .groupBy(col(idx.idCol)).agg(count(lit(1)).as("hits"))
  }

  /** ORDERED PROXIMITY retrieval — [[phraseMatch]] generalized by a
    * per-step `slop`: the documents where the terms occur in order
    * with at most `slop` − 1 other tokens between consecutive terms
    * (slop = 1 IS the exact phrase — spec-pinned identity), with the
    * count of distinct term-position chains: (idCol, hits). The
    * "terms near each other, in order" primitive between matchAll's
    * bag-of-words and phraseMatch's exact adjacency. Each step is an
    * equi-join on the doc id with the gap bound as a post-join range
    * predicate — candidate pairs per doc are bounded by the probed
    * terms' in-doc tf product, never corpus-scale, and the scan
    * still reads only the probed terms' row groups.
    */
  def proximityMatch(s: SparkSession, idx: Index, terms: Seq[String],
      slop: Int): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(slop >= 1, "slop must be >= 1 (1 = exact phrase)")
    val probed = idx.postings(s)
      .filter(col("token").isin(terms.distinct: _*))
    val slots = terms.zipWithIndex.map { case (t, i) =>
      probed.filter(col("token") === t)
        .select(col(idx.idCol), explode(col("positions")).as(s"_p$i"))
    }
    val chained = slots.zipWithIndex.tail.foldLeft(slots.head) {
      case (acc, (slot, i)) =>
        acc.join(slot, Seq(idx.idCol))
          .filter((col(s"_p$i") - col(s"_p${i - 1}")).between(1, slop))
    }
    chained.groupBy(col(idx.idCol)).agg(count(lit(1)).as("hits"))
  }

  // ---- session-lifetime store per corpus directory ----------------

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, Index]()

  def indexDirFor(dataDir: String, suffix: String = ""): String =
    StoreDirs.dirFor("target/text-index/", dataDir, suffix)

  /** The memoized index for the `documents` corpus at `dataDir`:
    * tokenized once per JVM, served by every consumer query. */
  def forCorpus(s: SparkSession, dataDir: String): Index =
    built.computeIfAbsent(dataDir, d =>
      build(s.read.parquet(s"$d/documents.parquet"), "doc_id", "text",
        indexDirFor(d)))
}
