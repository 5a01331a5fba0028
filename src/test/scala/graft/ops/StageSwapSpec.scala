package graft.ops

import graft.SparkSpec

/** The swap's crash-state contract: at every interruption point a
  * COMPLETE stage is recoverable, [[StageSwap.recover]] heals each
  * reachable state, and recovery direction is ROLLBACK — an
  * interrupted (uncommitted) swap reverts to the prior stage, so a
  * re-run of the whole store update is exactly-once instead of
  * silently double-applying the batch (the failure the roll-forward
  * version had). The commit point is swapIn's final aside-copy
  * removal.
  */
class StageSwapSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("stage-swap")
    java.nio.file.Files.delete(d)
    s"$d/stage"
  }

  private def write(path: String, vals: Seq[Int]): Unit =
    vals.toDF("v").coalesce(1).write.mode("overwrite").parquet(path)

  private def readVals(path: String): Set[Int] =
    spark.read.parquet(path).as[Int].collect().toSet

  private def fs(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def exists(dir: String): Boolean =
    fs(dir).exists(new org.apache.hadoop.fs.Path(dir))

  test("normal swap replaces the stage and leaves no side dirs") {
    val dir = freshDir()
    write(dir, Seq(1, 2))
    write(s"$dir.next", Seq(3, 4))
    StageSwap.swapIn(spark, dir)
    assert(readVals(dir) == Set(3, 4))
    assert(!exists(s"$dir.next") && !exists(s"$dir.old"))
  }

  test("recover rolls BACK a swap that died between the renames") {
    // state: dir missing, dir.old = previous stage, dir.next = new.
    // The swap never committed — the previous stage must win, and the
    // staged dir must be dropped, so the caller's re-run of the whole
    // update applies its batch exactly once
    val dir = freshDir()
    write(s"$dir.old", Seq(1, 2))
    write(s"$dir.next", Seq(3, 4))
    StageSwap.recover(spark, dir)
    assert(readVals(dir) == Set(1, 2), "the prior stage wins")
    assert(!exists(s"$dir.next") && !exists(s"$dir.old"))
  }

  test("recover rolls back when only the aside copy survives") {
    val dir = freshDir()
    write(s"$dir.old", Seq(1, 2))
    StageSwap.recover(spark, dir)
    assert(readVals(dir) == Set(1, 2))
    assert(!exists(s"$dir.old"))
  }

  test("recover rolls back a swap that died before its commit") {
    // state: dir = swapped-in new stage, dir.old = previous stage —
    // the final aside-copy removal (the COMMIT) never ran. Rollback:
    // the update reverts entirely, and the re-run re-applies it once
    val dir = freshDir()
    write(dir, Seq(3, 4))
    write(s"$dir.old", Seq(1, 2))
    StageSwap.recover(spark, dir)
    assert(readVals(dir) == Set(1, 2), "uncommitted swap reverts")
    assert(!exists(s"$dir.old") && !exists(s"$dir.next"))
  }

  test("recover completes a FIRST materialization (nothing to restore)") {
    // dir and dir.old both absent: there is no prior stage, so the
    // complete .next is the only stage there is — roll forward
    val dir = freshDir()
    write(s"$dir.next", Seq(3, 4))
    StageSwap.recover(spark, dir)
    assert(readVals(dir) == Set(3, 4))
    assert(!exists(s"$dir.next") && !exists(s"$dir.old"))
  }

  test("swapIn on a FIRST materialization succeeds via recover's promotion") {
    // dir absent, .next staged: swapIn's opening recover() already
    // promotes .next to dir — the call must then report success, not
    // demand a staged dir that its own recovery legitimately consumed
    val dir = freshDir()
    write(s"$dir.next", Seq(3, 4))
    StageSwap.swapIn(spark, dir)
    assert(readVals(dir) == Set(3, 4))
    assert(!exists(s"$dir.next") && !exists(s"$dir.old"))
    // but a swapIn with NOTHING anywhere is still a loud error
    val empty = freshDir()
    intercept[IllegalArgumentException] {
      StageSwap.swapIn(spark, empty)
    }
  }

  test("recover DROPS a first materialization that died mid-write " +
      "(no _SUCCESS) instead of promoting the partial stage") {
    // fabricate a write that crashed during job commit: some part
    // files landed at the .next top level, the _SUCCESS marker (the
    // committer's last act) never did. dir and dir.old absent — the
    // old roll-forward would install this PARTIAL stage as the
    // committed one, and the store-level marker settlement would
    // then read its listing as a committed batch
    val dir = freshDir()
    write(s"$dir.next", Seq(3, 4))
    val f = fs(dir)
    assert(f.delete(
      new org.apache.hadoop.fs.Path(s"$dir.next/_SUCCESS"), false))
    StageSwap.recover(spark, dir)
    assert(!exists(dir), "partial stage must not be promoted")
    assert(!exists(s"$dir.next"), "crashed write heals to a no-op")
  }

  test("recover leaves a healthy stage (and a half-written .next) alone") {
    val dir = freshDir()
    write(dir, Seq(1))
    write(s"$dir.next", Seq(9)) // a write that never reached its swap
    StageSwap.recover(spark, dir)
    assert(readVals(dir) == Set(1))
    assert(exists(s"$dir.next"), "stale .next is the re-run's problem")
  }

  test("interrupted swap + re-run of the whole update is exactly-once") {
    // the end-to-end property the rollback direction buys: simulate
    // an update that crashed between the renames, then RE-RUN it —
    // the final stage must be single-application, not double
    val dir = freshDir()
    write(dir, Seq(1, 2))            // committed stage
    // crashed update: staged its result, renamed cur aside, died
    write(s"$dir.next", Seq(1, 2, 3))
    val f = fs(dir)
    StageSwap.rename(f, new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(s"$dir.old"))
    // re-run: recover (heals to pre-update), re-stage, swap
    StageSwap.recover(spark, dir)
    assert(readVals(dir) == Set(1, 2))
    write(s"$dir.next", Seq(1, 2, 3))
    StageSwap.swapIn(spark, dir)
    assert(readVals(dir) == Set(1, 2, 3))
    assert(!exists(s"$dir.next") && !exists(s"$dir.old"))
  }

  test("a failed rename is loud, not silent") {
    // Hadoop's FileSystem.rename reports many failures by returning
    // FALSE rather than throwing (dest exists as a file is the
    // deterministic local-fs case); the checked wrapper every
    // swap/recover rename goes through must turn that into a throw —
    // the unchecked version would have continued into the corrupting
    // rename-into-existing-dir sequence the advice flagged
    val dir = freshDir()
    val f = fs(dir)
    write(dir, Seq(1))
    val destFile = new org.apache.hadoop.fs.Path(s"$dir-dest")
    f.create(destFile).close() // plain file occupies the destination
    val e = intercept[IllegalArgumentException] {
      StageSwap.rename(f, new org.apache.hadoop.fs.Path(dir), destFile)
    }
    assert(e.getMessage.contains("rename"))
    assert(readVals(dir) == Set(1), "failed rename must not move data")
  }
}
