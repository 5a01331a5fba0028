package graft.ops

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** The marker protocol's own files must be crash-safe: the round-13
  * review found that a non-atomic marker write could leave a
  * zero-length `_inflight` which settlement would then parse as a
  * marker with NO listings and "heal" every live data file away —
  * data loss inside the crash-safety protocol itself. This spec pins
  * the two closures: markers commit by tmp+rename (no partial state
  * at the final name), and a garbage marker fails LOUDLY instead of
  * settling.
  */
class UpdateMarkerSpec extends SparkSpec {

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("marker").toString
  private def fs = new Path(tmp)
    .getFileSystem(spark.sessionState.newHadoopConf())

  test("write commits atomically and round-trips; a second writer " +
      "fails loudly at the existing marker") {
    val dir = s"$tmp/a"
    fs.mkdirs(new Path(dir))
    val marker = UpdateMarker.markerPath(dir)
    val state = UpdateMarker.State("b-7",
      Map("codes" -> Set(s"$dir/codes/p1.parquet", s"$dir/codes/p2.parquet")))
    UpdateMarker.write(fs, marker, state)
    assert(!fs.exists(new Path(marker.getParent,
      marker.getName + ".tmp")), "tmp file left behind")
    assert(UpdateMarker.read(fs, marker).contains(state))
    val e = intercept[IllegalStateException] {
      UpdateMarker.write(fs, marker, state)
    }
    assert(e.getMessage.contains("concurrent"))
    UpdateMarker.delete(fs, marker)
  }

  test("a zero-length / garbage marker refuses to settle instead of " +
      "healing live data against empty listings") {
    val dir = s"$tmp/b"
    fs.mkdirs(new Path(dir))
    val marker = UpdateMarker.markerPath(dir)
    for (bytes <- Seq(Array.empty[Byte], "garbage\n".getBytes("UTF-8"))) {
      val out = fs.create(marker, true)
      try out.write(bytes) finally out.close()
      val e = intercept[IllegalStateException] {
        UpdateMarker.read(fs, marker)
      }
      assert(e.getMessage.contains("corrupt"))
      // the append-protocol settlement path fails the same way —
      // it must never reach the heal step
      intercept[IllegalStateException] {
        UpdateMarker.settleAppend(fs, dir,
          Map("codes" -> ((() => Set.empty[String], () => ()))), None)
      }
    }
    UpdateMarker.delete(fs, marker)
  }

  test("writeApplied replaces the record atomically (tmp+rename; " +
      "no truncated id at the final name)") {
    val dir = s"$tmp/c"
    fs.mkdirs(new Path(dir))
    UpdateMarker.writeApplied(fs, dir, "batch-1")
    assert(UpdateMarker.readApplied(fs, dir).contains("batch-1"))
    UpdateMarker.writeApplied(fs, dir, "batch-2")
    assert(UpdateMarker.readApplied(fs, dir).contains("batch-2"))
    assert(!fs.exists(new Path(s"$dir/_applied.tmp")),
      "tmp file left behind")
  }
}
