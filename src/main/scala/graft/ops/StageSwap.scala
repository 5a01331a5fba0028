package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Crash-safe replacement of a staged parquet directory. The naive
  * delete-then-rename swap has a destructive window: a crash between
  * the two calls loses the stage entirely (for a single-stage store
  * like [[StatsStore]], that is ALL of its state). Renaming the
  * current stage ASIDE first closes it: at every intermediate point
  * the data exists at `dir`, `dir.old`, or both, and the aside copy
  * is only dropped once the new stage is in place. A crash mid-swap
  * leaves `dir` missing only in the window where `dir.old` (or the
  * complete `dir.next`) still holds a full stage — and [[recover]]
  * heals exactly that window, so a re-run of a store update never
  * sees a missing stage. (At cluster scale you'd version the
  * directory and flip a pointer, the same move as
  * `EventStream.mergeBatch`'s history versions; this is the
  * single-filesystem equivalent.)
  *
  * Every rename checks its return value: Hadoop `FileSystem.rename`
  * reports most failures (dest exists, permissions, cross-fs moves)
  * by returning FALSE, not throwing — and a silently-failed
  * `cur -> old` would make the following `next -> cur` rename INTO
  * the still-existing directory, nesting the staged dir inside the
  * live one. Failing loudly keeps the invariant that `dir` is either
  * the old stage or the new stage, never a hybrid.
  */
object StageSwap {

  private[ops] def rename(fs: FileSystem, from: Path, to: Path): Unit =
    require(fs.rename(from, to), s"rename $from -> $to failed")

  private def paths(spark: SparkSession,
      dir: String): (FileSystem, Path, Path, Path) = {
    val cur = new Path(dir)
    val fs = cur.getFileSystem(spark.sessionState.newHadoopConf())
    (fs, cur, new Path(s"$dir.next"), new Path(s"$dir.old"))
  }

  /** Heal a crash-interrupted [[swapIn]] so `dir` holds a complete
    * stage again. The reachable crash states and their repairs:
    *
    *  - `dir` missing, `dir.next` present: died between the two
    *    renames. `next` was fully written before the swap started,
    *    so finish the swap (`next -> dir`, drop the aside copy).
    *  - `dir` missing, only `dir.old` present: `next` already moved
    *    away by an outside actor — roll back (`old -> dir`).
    *  - `dir` present, `dir.old` present: died after the swap
    *    completed but before the aside copy was dropped — drop it.
    *  - `dir` present alone (with or without a stale `dir.next` from
    *    a write that never reached its swap): nothing to do; a
    *    re-run overwrites `.next` anyway.
    *
    * Idempotent; called automatically at the top of [[swapIn]] and
    * by the stores' update paths before they read the current stage.
    */
  def recover(spark: SparkSession, dir: String): Unit = {
    val (fs, cur, next, old) = paths(spark, dir)
    if (!fs.exists(cur)) {
      if (fs.exists(next)) {
        rename(fs, next, cur)
        fs.delete(old, true)
        spark.catalog.refreshByPath(dir)
      } else if (fs.exists(old)) {
        rename(fs, old, cur)
        spark.catalog.refreshByPath(dir)
      }
    } else if (fs.exists(old)) {
      fs.delete(old, true)
    }
  }

  /** Swap the already-written `dir.next` in as `dir`. */
  def swapIn(spark: SparkSession, dir: String): Unit = {
    recover(spark, dir)
    val (fs, cur, next, old) = paths(spark, dir)
    require(fs.exists(next), s"no staged replacement at $next")
    fs.delete(old, true)
    if (fs.exists(cur)) rename(fs, cur, old)
    rename(fs, next, cur)
    fs.delete(old, true)
    spark.catalog.refreshByPath(dir)
  }
}
