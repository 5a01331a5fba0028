package graft.ops

import org.apache.spark.sql.SparkSession

/** Crash-safe replacement of a staged parquet directory. The naive
  * delete-then-rename swap has a destructive window: a crash between
  * the two calls loses the stage entirely (for a single-stage store
  * like [[StatsStore]], that is ALL of its state). Renaming the
  * current stage ASIDE first closes it: at every intermediate point
  * the data exists at `dir`, `dir.old`, or both, and the aside copy
  * is only dropped once the new stage is in place. A crash mid-swap
  * leaves `dir` missing only in the window where `dir.old` holds the
  * previous stage — recoverable by renaming it back (at cluster
  * scale you'd version the directory and flip a pointer, the same
  * move as `EventStream.mergeBatch`'s history versions; this is the
  * single-filesystem equivalent).
  */
object StageSwap {

  /** Swap the already-written `dir.next` in as `dir`. */
  def swapIn(spark: SparkSession, dir: String): Unit = {
    val hconf = spark.sessionState.newHadoopConf()
    val cur = new org.apache.hadoop.fs.Path(dir)
    val next = new org.apache.hadoop.fs.Path(s"$dir.next")
    val old = new org.apache.hadoop.fs.Path(s"$dir.old")
    val fs = cur.getFileSystem(hconf)
    require(fs.exists(next), s"no staged replacement at $next")
    fs.delete(old, true)
    if (fs.exists(cur)) fs.rename(cur, old)
    fs.rename(next, cur)
    fs.delete(old, true)
    spark.catalog.refreshByPath(dir)
  }
}
