package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Crash-safe replacement of a staged parquet directory, with
  * ROLLBACK recovery. The naive delete-then-rename swap has a
  * destructive window: a crash between the two calls loses the stage
  * entirely (for a single-stage store like [[StatsStore]], that is
  * ALL of its state). Renaming the current stage ASIDE first closes
  * it: at every intermediate point a complete stage exists at `dir`,
  * `dir.old`, or both.
  *
  * Recovery DIRECTION is the load-bearing choice. The swap is the
  * commit point of a store update, and [[recover]] rolls an
  * interrupted swap BACK (the aside copy wins; the staged `.next` is
  * dropped): a caller whose update threw can then simply RE-RUN the
  * whole update and get exactly-once semantics, because the crashed
  * attempt healed to a no-op. The earlier roll-forward policy
  * (promote `.next`) silently COMMITTED the crashed update — the
  * documented re-run then folded the same batch twice, permanently
  * double-counting every additive field in the store. Rolling
  * forward is kept only for the one state with nothing to restore
  * (`dir` and `dir.old` both absent, `.next` complete): a first
  * materialization whose swap died between the renames.
  *
  * Commit point, precisely: [[swapIn]]'s final removal of the aside
  * copy. Any crash before it leaves `dir.old` in place and recovery
  * reverts the update; once the aside copy is gone the new stage is
  * durable. (A crash between the commit and the caller's
  * acknowledgment can still leave an operator unsure whether the
  * update applied — the store-level `batchId` markers in
  * [[StatsStore.update]]/[[CurationStore.update]] close that last
  * window by making a committed batch's re-run a detected no-op.)
  *
  * Every rename and delete checks its return value: Hadoop
  * `FileSystem` reports most failures (dest exists, permissions,
  * cross-fs moves) by returning FALSE, not throwing — and a
  * silently-failed `cur -> old` would make the following
  * `next -> cur` rename INTO the still-existing directory, nesting
  * the staged dir inside the live one; a silently-failed final
  * delete would leave the commit ambiguous. Failing loudly keeps the
  * invariant that `dir` is either the old stage or the new stage,
  * never a hybrid — and that a returned swapIn really committed.
  */
object StageSwap {

  private[ops] def rename(fs: FileSystem, from: Path, to: Path): Unit =
    require(fs.rename(from, to), s"rename $from -> $to failed")

  private[ops] def remove(fs: FileSystem, p: Path): Unit =
    require(fs.delete(p, true) || !fs.exists(p), s"delete $p failed")

  private def paths(spark: SparkSession,
      dir: String): (FileSystem, Path, Path, Path) = {
    val cur = new Path(dir)
    val fs = cur.getFileSystem(spark.sessionState.newHadoopConf())
    (fs, cur, new Path(s"$dir.next"), new Path(s"$dir.old"))
  }

  /** Heal a crash-interrupted [[swapIn]] so `dir` holds the COMMITTED
    * stage again. The reachable crash states and their repairs:
    *
    *  - `dir.old` present (with `dir` present, absent, or a stale
    *    `.next` beside it): the swap never reached its commit —
    *    roll BACK. The aside copy is restored as `dir`, the
    *    swapped-in or staged new stage is dropped. A re-run of the
    *    interrupted update is then exactly-once.
    *  - `dir` and `dir.old` both missing, `dir.next` present WITH its
    *    `_SUCCESS` marker: a first materialization died between the
    *    renames; `.next` was fully written (every `.next` in this
    *    repo comes from a Spark writer, whose job commit writes
    *    `_SUCCESS` last) and there is no prior stage to restore —
    *    finish the swap. WITHOUT `_SUCCESS` the `.next` is a write
    *    that died MID-JOB-COMMIT (some part files moved, marker
    *    never written) — promoting it would install a partial stage
    *    and, worse, make the store-level marker settlement read the
    *    partial listing as "committed"; it is dropped instead, so
    *    the crashed first write heals to a no-op and the re-run is
    *    exactly-once.
    *  - `dir` present alone (with or without a stale `dir.next` from
    *    a write that never reached its swap): nothing to do; a
    *    re-run overwrites `.next` anyway.
    *
    * Idempotent; called automatically at the top of [[swapIn]] and
    * by the stores' update paths before they read the current stage.
    */
  def recover(spark: SparkSession, dir: String): Unit = {
    val (fs, cur, next, old) = paths(spark, dir)
    if (fs.exists(old)) {
      if (fs.exists(cur)) remove(fs, cur)
      rename(fs, old, cur)
      remove(fs, next)
      spark.catalog.refreshByPath(dir)
    } else if (!fs.exists(cur) && fs.exists(next)) {
      // this branch's committed-vs-partial decision is the _SUCCESS
      // marker — it is only sound while the committer actually writes
      // one. A deployment that disabled the marker (a common
      // object-store tuning) would see recover() DESTROY a fully
      // committed first materialization; fail loudly instead of
      // guessing.
      require(spark.sessionState.newHadoopConf().getBoolean(
          "mapreduce.fileoutputcommitter.marksuccessfuljobs", true),
        "StageSwap.recover requires _SUCCESS markers to distinguish " +
          "a committed first materialization from a partial write — " +
          "mapreduce.fileoutputcommitter.marksuccessfuljobs must stay " +
          "at its default (true) for sessions using staged stores")
      if (fs.exists(new Path(next, "_SUCCESS"))) {
        rename(fs, next, cur)
      } else {
        // partial write (died mid-job-commit): drop, don't promote
        remove(fs, next)
      }
      spark.catalog.refreshByPath(dir)
    }
  }

  /** Swap the already-written `dir.next` in as `dir`. The final
    * aside-copy removal is the COMMIT: crash anywhere before it and
    * [[recover]] reverts to the prior stage.
    */
  def swapIn(spark: SparkSession, dir: String): Unit = {
    recover(spark, dir)
    val (fs, cur, next, old) = paths(spark, dir)
    if (!fs.exists(next)) {
      // on a FIRST materialization (no prior stage) recover() itself
      // promotes `.next` to `dir` — the swap this call was asked to
      // perform already happened; demanding a staged dir here would
      // throw on a successful swap
      require(fs.exists(cur), s"no staged replacement at $next")
      return
    }
    if (fs.exists(cur)) rename(fs, cur, old)
    rename(fs, next, cur)
    remove(fs, old)
    spark.catalog.refreshByPath(dir)
  }
}
