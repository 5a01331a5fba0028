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
  * range, a manifest hash). Callers that pass none still get partial
  * appends healed and rollback re-runs deduped; only the
  * committed-but-unacknowledged re-run remains indistinguishable
  * from a genuinely new batch for them — documented at each
  * update's scaladoc.
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

  def write(fs: FileSystem, marker: Path, state: State): Unit = {
    val sb = new StringBuilder(s"id\t${state.batchId}\n")
    for ((stage, files) <- state.listings.toSeq.sortBy(_._1);
         f <- files.toSeq.sorted)
      sb.append(s"$stage\t$f\n")
    val out = fs.create(marker, true)
    try out.write(sb.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def read(fs: FileSystem, marker: Path): Option[State] = {
    if (!fs.exists(marker)) return None
    val in = fs.open(marker)
    val text =
      try {
        val src = scala.io.Source.fromInputStream(in, "UTF-8")
        try src.mkString finally src.close()
      } finally in.close()
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    val id = lines.collectFirst {
      case l if l.startsWith("id\t") => l.stripPrefix("id\t")
    }.getOrElse("")
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
}
