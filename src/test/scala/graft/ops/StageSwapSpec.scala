package graft.ops

import graft.SparkSpec

/** The swap's crash-state contract: at every interruption point the
  * stage is recoverable, [[StageSwap.recover]] heals each reachable
  * state, and the healed directory always holds a COMPLETE stage
  * (either the old one or the new one, never a hybrid or a nested
  * mess — the failure the unchecked-rename version risked).
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

  test("swap with a stale .old from a prior crash still succeeds") {
    val dir = freshDir()
    write(dir, Seq(1))
    write(s"$dir.old", Seq(0))
    write(s"$dir.next", Seq(2))
    StageSwap.swapIn(spark, dir)
    assert(readVals(dir) == Set(2))
    assert(!exists(s"$dir.next") && !exists(s"$dir.old"))
  }

  test("recover completes a swap that died between the renames") {
    // state: dir missing, dir.old = previous stage, dir.next = new
    val dir = freshDir()
    write(s"$dir.old", Seq(1, 2))
    write(s"$dir.next", Seq(3, 4))
    StageSwap.recover(spark, dir)
    assert(readVals(dir) == Set(3, 4), "the complete .next wins")
    assert(!exists(s"$dir.next") && !exists(s"$dir.old"))
  }

  test("recover rolls back when only the aside copy survives") {
    val dir = freshDir()
    write(s"$dir.old", Seq(1, 2))
    StageSwap.recover(spark, dir)
    assert(readVals(dir) == Set(1, 2))
    assert(!exists(s"$dir.old"))
  }

  test("recover drops the aside copy of a completed swap") {
    val dir = freshDir()
    write(dir, Seq(3, 4))
    write(s"$dir.old", Seq(1, 2))
    StageSwap.recover(spark, dir)
    assert(readVals(dir) == Set(3, 4), "current stage untouched")
    assert(!exists(s"$dir.old"))
  }

  test("recover leaves a healthy stage (and a half-written .next) alone") {
    val dir = freshDir()
    write(dir, Seq(1))
    write(s"$dir.next", Seq(9)) // a write that never reached its swap
    StageSwap.recover(spark, dir)
    assert(readVals(dir) == Set(1))
    assert(exists(s"$dir.next"), "stale .next is the re-run's problem")
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
