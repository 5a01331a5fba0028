package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

/** Tiny in-flight marker making a store update's RE-RUN safe across
  * every crash window, including the one [[StageSwap]] alone cannot
  * close: a crash AFTER the swap committed but BEFORE the caller saw
  * success. The protocol (used by [[StatsStore.update]] and
  * [[CurationStore.update]]):
  *
  *  1. entry — if a marker exists, the previous update crashed.
  *     Decide whether it committed by comparing the COMMIT STAGE's
  *     current file listing against the listing snapshotted in the
  *     marker (a swap always replaces the stage's part files, and a
  *     [[StageSwap.recover]] rollback restores the original names —
  *     so listing-equality ⇔ not committed). Uncommitted: the
  *     caller deletes any partial side-stage appends (files not in
  *     the snapshot) and proceeds. Committed with the SAME batchId
  *     as this call: the batch is already applied — return without
  *     touching the store.
  *  2. write the marker (batchId + pre-update listings), run the
  *     update, commit via [[StageSwap.swapIn]], delete the marker.
  *
  * `batchId` is the caller's idempotence key (a date, an offset
  * range, a manifest hash — non-empty when defined; the empty string
  * is the marker's encoding of "no key", so accepting it would alias
  * a keyless run). Callers that pass none still get partial appends
  * healed and rollback re-runs deduped; only the
  * committed-but-unacknowledged re-run remains indistinguishable
  * from a genuinely new batch for them — documented at each
  * update's scaladoc.
  *
  * The in-flight marker alone leaves one replay window open even
  * WITH a batchId: a crash after the update deleted its marker but
  * before the CALLER durably acknowledged (a streaming checkpoint's
  * advance, an orchestrator's state write) — the re-run finds no
  * marker and re-folds. [[writeApplied]] closes it: before the
  * in-flight marker is deleted, the committed batchId is recorded in
  * a durable `_applied` file, and an update whose batchId matches
  * `_applied` is a detected no-op however late the crash landed. One
  * id suffices because an at-least-once producer replays only the
  * batch it has not yet acknowledged — a NEW batch carries a new id
  * and overwrites the record at its own commit.
  *
  * SINGLE WRITER: the whole protocol assumes at most one in-flight
  * update per store directory — two concurrent updaters would race
  * on the marker and the stage swap and corrupt the snapshot
  * discipline. [[write]] guards it cheaply: the marker is created
  * with the fail-if-exists flag, so the second concurrent updater
  * errors loudly at entry instead of silently interleaving.
  * Serialize updates per store; readers are unaffected.
  *
  * Format: one `id\t<batchId>` line, then one `<stage>\t<path>` line
  * per snapshotted file. Plain text via the Hadoop FS API so it
  * works on any filesystem the stages live on.
  */
object UpdateMarker {

  final case class State(batchId: String,
      listings: Map[String, Set[String]])

  def markerPath(storeDir: String): Path =
    new Path(s"$storeDir/_inflight")

  /** All committed data files of a stage directory (top level). */
  def listFiles(fs: FileSystem, dir: String): Set[String] = {
    val p = new Path(dir)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).toSeq.filter(_.isFile)
      .map(_.getPath.toString).filter(_.endsWith(".parquet")).toSet
  }

  /** All data files of a PARTITIONED stage directory — recursive,
    * because a `partitionBy` write nests its files under partition
    * subdirectories where the flat [[listFiles]] cannot see them
    * (an [[AnnIndexStore]] codes stage). Snapshot and heal must use
    * the same listing shape or settlement would judge every
    * partitioned append invisible. */
  def listFilesRecursive(fs: FileSystem, dir: String): Set[String] = {
    val p = new Path(dir)
    if (!fs.exists(p)) return Set.empty
    val it = fs.listFiles(p, true)
    val out = scala.collection.mutable.Set.empty[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet"))
        out += f.getPath.toString
    }
    out.toSet
  }

  /** ONE definition of the entry-point settlement both stores run —
    * the whole pre-update protocol (heal the commit stage, settle a
    * crashed predecessor's marker, durable `_applied` replay check,
    * fresh marker write) in a single place, because its correctness
    * depends on [[StatsStore.update]] and [[CurationStore.update]]
    * staying in exact lockstep (this file's `_applied` record had to
    * be patched into both in parallel once already).
    *
    * `stages` maps marker stage names to their directories;
    * `commitStage` names the one whose listing decides commitment
    * (the stage the update's [[StageSwap.swapIn]] replaces); the
    * remaining stages are append-only sides whose partial files from
    * an uncommitted crash are dropped. Returns TRUE when `batchId`
    * is already applied — the caller must return its store untouched
    * — and FALSE when a fresh marker has been written and the update
    * should proceed.
    */
  def settle(spark: org.apache.spark.sql.SparkSession, fs: FileSystem,
      storeDir: String, commitStage: String,
      stages: Map[String, String], batchId: Option[String],
      recursiveStages: Set[String] = Set.empty): Boolean = {
    require(batchId.forall(_.nonEmpty),
      "batchId, when defined, must be non-empty (the empty string is " +
        "the marker's encoding of 'no idempotence key')")
    // a prior update may have died inside its commit swap — heal the
    // stage before reading it, or the listings below see a half-swap
    StageSwap.recover(spark, stages(commitStage))
    val marker = markerPath(storeDir)
    // stages named in `recursiveStages` are PARTITIONED append
    // targets: their snapshot and heal must list recursively or the
    // nested data files are invisible to both
    def files(stage: String, dir: String): Set[String] =
      if (recursiveStages(stage)) listFilesRecursive(fs, dir)
      else listFiles(fs, dir)
    val sameBatchApplied = read(fs, marker).map { prior =>
      // rollback restored the snapshotted names, a committed swap
      // replaced them — listing equality decides commitment. The
      // durable `_applied` record is an INDEPENDENT commit witness
      // (written only after the swap): it covers the one shape
      // listing equality cannot — a commit stage whose swap replaced
      // zero parquet files (e.g. a bucketed store's empty label
      // delta), where healing the side-stage appends of a batch that
      // DID commit would throw its rows away while reporting the
      // batch applied.
      val committed = files(commitStage, stages(commitStage)) !=
          prior.listings.getOrElse(commitStage, Set.empty[String]) ||
        (prior.batchId.nonEmpty &&
          readApplied(fs, storeDir).contains(prior.batchId))
      // a MAINTENANCE writer's marker (listings keyed `<stage>.swap`
      // — a compact): its rewrites commit through [[StageSwap]] on
      // stages the commit-stage listing does not witness, and its
      // partial output lives at `.next`, never inside a stage — so
      // settlement must NEVER heal stage files for it (after a
      // committed stage swap with a crashed marker delete, the
      // listing diff IS the new live data). The [[settleAppend]]
      // decision table, applied to the swap-commit protocol.
      val maintenance = prior.listings.keys.exists(_.endsWith(".swap"))
      if (!committed && !maintenance) {
        // crashed before the commit: drop the partial side-stage
        // appends so the re-run's before/after diffs start clean
        (stages - commitStage).foreach { case (name, dir) =>
          (files(name, dir) -- prior.listings.getOrElse(name,
              Set.empty[String]))
            .foreach(f => StageSwap.remove(fs, new Path(f)))
          spark.catalog.refreshByPath(dir)
        }
      }
      if (committed && prior.batchId.nonEmpty)
        writeApplied(fs, storeDir, prior.batchId)
      delete(fs, marker)
      committed && batchId.isDefined && prior.batchId == batchId.get
    }.getOrElse(false)
    // the durable applied record catches the replay a deleted marker
    // cannot: committed, marker gone, caller never acknowledged
    if (sameBatchApplied ||
        (batchId.isDefined && readApplied(fs, storeDir) == batchId))
      return true
    write(fs, marker, State(batchId.getOrElse(""),
      stages.map { case (n, d) => n -> files(n, d) }))
    false
  }

  /** Entry-point settlement for an APPEND-COMMIT store stage (the
    * [[AnnIndexStore]] protocol) — the dual of [[settle]]'s
    * swap-commit detection, centralized HERE for the same reason
    * settle is: the decision table below is correctness-critical and
    * must not fork per store.
    *
    * A swap writer's commitment is visible as listing INEQUALITY on
    * its commit stage; an append writer's is NOT (a partial append
    * and a committed one both change the listing), so an append's
    * commitment is witnessed only by the durable `_applied` record
    * written before its marker delete. Decision per crashed marker:
    *
    *  - marker stage `"$stage.swap"` (a MAINTENANCE writer, e.g.
    *    compact): its partial output lives at `$stage.next`, never
    *    inside the stage, and [[StageSwap.recover]] (which the
    *    caller MUST run before this) already healed it — whether the
    *    swap committed or rolled back, the stage's files are all
    *    live data. Settlement only drops the marker; it NEVER
    *    deletes stage files for this kind. (Deciding "committed vs
    *    not" by listing equality and healing the diff — the [[settle]]
    *    rule — would delete the entire freshly-compacted stage after
    *    a committed swap whose writer died before its marker delete.)
    *  - marker stage `stage` (an APPEND writer): `_applied` naming
    *    its batch means the append finished; otherwise heal — drop
    *    the files beyond the snapshot so the re-run is exactly-once
    *    by redo.
    *
    * `stages` maps each append stage the store's writers touch to its
    * (listing, healed) pair: `listing` must enumerate the stage's
    * data files RECURSIVELY when the stage is partitioned (the append
    * store's layout); `healed` runs after files are dropped (cache
    * invalidation). EVERY writer of the store must snapshot EVERY
    * stage in its marker (an untouched stage snapshots as its current
    * listing — the heal diff is then empty by construction), because
    * settlement heals each stage against the crashed marker's
    * snapshot for that stage: a missing key reads as an empty
    * snapshot and the heal would delete the whole stage. Returns TRUE
    * when `batchId` is already applied — the caller returns its
    * store untouched WITHOUT writing a fresh marker; FALSE when the
    * caller should write its own marker ([[write]]'s fail-if-exists
    * guard stays its concurrency backstop) and proceed.
    */
  def settleAppend(fs: FileSystem, storeDir: String,
      stages: Map[String, (() => Set[String], () => Unit)],
      batchId: Option[String]): Boolean = {
    require(batchId.forall(_.nonEmpty),
      "batchId, when defined, must be non-empty (the empty string is " +
        "the marker's encoding of 'no idempotence key')")
    val marker = markerPath(storeDir)
    read(fs, marker).foreach { prior =>
      val committed = prior.batchId.nonEmpty &&
        readApplied(fs, storeDir).contains(prior.batchId)
      val maintenance = prior.listings.keys.exists(_.endsWith(".swap"))
      if (!committed && !maintenance) {
        stages.foreach { case (stage, (listing, healed)) =>
          val beyond =
            listing() -- prior.listings.getOrElse(stage, Set.empty)
          if (beyond.nonEmpty) {
            beyond.foreach(f => StageSwap.remove(fs, new Path(f)))
            healed()
          }
        }
      }
      delete(fs, marker)
    }
    batchId.isDefined && readApplied(fs, storeDir) == batchId
  }

  /** Write the in-flight marker, FAILING if one already exists — the
    * single-writer guard: callers settle a crashed predecessor's
    * marker before writing their own, so an existing marker here
    * means another updater is in flight right now. (Best-effort by
    * construction: it catches simultaneous ENTRY, not an entry that
    * lands while an earlier writer's long append job is mid-flight —
    * the earlier settle consumed that writer's marker, because a
    * marker cannot distinguish crashed from live. Serializing
    * writers per store directory remains the caller's contract, as
    * documented at each store's update/compact.)
    *
    * The marker itself commits ATOMICALLY: bytes land at a `.tmp`
    * name and RENAME into place (the atomic commit primitive on
    * HDFS and local filesystems). A create-then-write at the final
    * name would open the one crash window the whole protocol can't
    * survive: a zero-length `_inflight` parses as a marker with no
    * listings, and settlement would "heal" every stage file against
    * an EMPTY snapshot — deleting the store's live data from inside
    * its own crash-safety protocol. [[read]]'s corrupt-marker check
    * is the second line of the same defense.
    */
  def write(fs: FileSystem, marker: Path, state: State): Unit = {
    // the single-writer guard must be an ATOMIC claim, not a
    // check-then-act: two concurrent writers both passing an
    // fs.exists() check would write the same tmp and both rename
    // successfully on a local filesystem (POSIX rename overwrites),
    // silently interleaving their appends and swaps. createNewFile
    // is the atomic create-if-absent primitive on HDFS and local.
    if (!fs.createNewFile(marker))
      throw new IllegalStateException(
        s"concurrent update detected: in-flight marker $marker " +
          "already exists. Stores support ONE writer at a time, and " +
          "every writer entry settles a CRASHED predecessor before " +
          "claiming — so this marker belongs to a writer that is " +
          "LIVE right now, not to a crash. Remedy: route every " +
          "writer of this store (maintain(), ingest, gated ingest, " +
          "delete, compact) through one scheduler lane or an " +
          "external lease/queue, and RETRY this operation after the " +
          "holder finishes; never delete a live marker by hand")
    val sb = new StringBuilder(s"id\t${state.batchId}\n")
    for ((stage, files) <- state.listings.toSeq.sortBy(_._1);
         f <- files.toSeq.sorted)
      sb.append(s"$stage\t$f\n")
    // content commits by renaming a UNIQUE tmp over our own claim
    // (unique so a crashed predecessor's tmp can never be renamed by
    // someone else's commit). Local rename replaces the zero-length
    // claim atomically; HDFS refuses to overwrite — delete our claim
    // and retry, and if an interloper stole the name inside that
    // gap, fail loudly rather than corrupt (they own the store now).
    val tmp = new Path(marker.getParent, marker.getName + ".tmp-" +
      java.util.UUID.randomUUID().toString)
    val out = fs.create(tmp, true)
    try out.write(sb.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, marker)) {
      fs.delete(marker, false)
      if (!fs.rename(tmp, marker)) {
        fs.delete(tmp, false)
        throw new IllegalStateException(
          s"could not commit in-flight marker $marker (rename failed " +
            "twice — a concurrent writer claimed the store)")
      }
    }
  }

  /** Age past which a zero-length marker is judged a CRASHED writer's
    * claim rather than a live writer inside [[write]]'s
    * createNewFile → content-rename window. That window is
    * microseconds of local work; a minute of grace is orders of
    * magnitude above it, while a genuinely crashed claim only delays
    * the next writer's settlement by the same minute. Without the
    * grace, a second writer entering between a LIVE writer's claim
    * and its content rename would clear the claim and both writers
    * would proceed — the atomic-claim guard silently weakened to
    * simultaneous-entry detection.
    */
  private[ops] val ClaimGraceMs = 60000L

  def read(fs: FileSystem, marker: Path): Option[State] = {
    if (!fs.exists(marker)) return None
    // a ZERO-LENGTH marker is [[write]]'s claim whose writer died
    // before the content rename — provably pre-mutation (stores
    // mutate only after write() returns), so the claim is safely
    // spent: clear it and report no marker. But only once it has
    // AGED past [[ClaimGraceMs]] — a younger claim could belong to a
    // writer alive inside write()'s claim-to-rename window, and
    // clearing it would let this caller proceed concurrently. Fail
    // loudly instead, same as write()'s own guard. Distinct from the
    // non-empty-but-corrupt case below, which could be a truncated
    // real marker and must also fail loudly.
    val st = fs.getFileStatus(marker)
    if (st.getLen == 0) {
      if (System.currentTimeMillis() - st.getModificationTime <
          ClaimGraceMs)
        throw new IllegalStateException(
          s"concurrent update detected: zero-length marker $marker " +
            "is younger than the claim grace period — a live writer " +
            "may be mid-claim (retry after it ages out, or serialize " +
            "updates per store directory)")
      StageSwap.remove(fs, marker)
      return None
    }
    val in = fs.open(marker)
    val text =
      try {
        val src = scala.io.Source.fromInputStream(in, "UTF-8")
        try src.mkString finally src.close()
      } finally in.close()
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    // a marker without its id line is not a marker — refuse to act
    // on it (a settlement run against garbage listings would "heal"
    // live data files away). [[write]]'s tmp+rename makes this state
    // unreachable for our own writers; the check guards truncated
    // files from a pre-rename store or a foreign writer.
    val id = lines.collectFirst {
      case l if l.startsWith("id\t") => l.stripPrefix("id\t")
    }.getOrElse(throw new IllegalStateException(
      s"corrupt in-flight marker $marker (no id line; " +
        s"${text.length} bytes) — refusing to settle against it; " +
        "inspect and remove the file manually"))
    val listings = lines.filterNot(_.startsWith("id\t"))
      .map { l =>
        val i = l.indexOf('\t')
        (l.substring(0, i), l.substring(i + 1))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    Some(State(id, listings))
  }

  def delete(fs: FileSystem, marker: Path): Unit =
    StageSwap.remove(fs, marker)

  def appliedPath(storeDir: String): Path =
    new Path(s"$storeDir/_applied")

  /** Durably record `batchId` as committed — called after the stage
    * swap's commit, BEFORE the in-flight marker is deleted, so at
    * every instant at least one of the two files names the committed
    * batch (see the replay-window note in the object scaladoc).
    * Overwrite is correct here: the record is a single most-recent
    * id, replaced at each subsequent batch's own commit.
    *
    * Committed via tmp + delete + rename so a crash mid-write can
    * never leave a TRUNCATED id (which would wrongly fail the
    * replay check and re-fold a committed batch). The instant
    * between the delete and the rename is safe: the in-flight
    * marker still exists at this point, and a crash there settles as
    * "uncommitted" — partial appends healed, batch re-run
    * exactly-once by redo.
    */
  def writeApplied(fs: FileSystem, storeDir: String,
      batchId: String): Unit = {
    val dst = appliedPath(storeDir)
    val tmp = new Path(dst.getParent, dst.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(batchId.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new IllegalStateException(
        s"could not commit applied-batch record $dst")
  }

  /** Drop both protocol files — called by the stores' [[build]]
    * paths: a full rebuild resets the store wholesale, and a stale
    * `_applied` id from the directory's previous life could alias a
    * fresh producer's batch ids (streaming epochs restart at 0).
    */
  def clear(fs: FileSystem, storeDir: String): Unit = {
    delete(fs, markerPath(storeDir))
    delete(fs, appliedPath(storeDir))
  }

  /** The last durably-committed batchId, if any batch recorded one. */
  def readApplied(fs: FileSystem, storeDir: String): Option[String] = {
    val p = appliedPath(storeDir)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    try {
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try Some(src.mkString) finally src.close()
    } finally in.close()
  }
}
