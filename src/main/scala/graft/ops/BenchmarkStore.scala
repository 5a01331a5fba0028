package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The decontamination gate's eval set as a VERSIONED STORE — the
  * one admission-gate input that was still an unmanaged per-call
  * frame. [[CorpusStore.ingestScreened]]'s `benchmark` argument
  * re-shingles and re-broadcasts raw eval text every batch, and
  * nothing records WHICH eval revision gated batch N: if the frame
  * changes between a crashed gated transaction and its replay, the
  * replayed decisions silently diverge — the only input the
  * convergence-under-replay contract did not pin. This store fixes
  * determinism and provenance at once, with the [[StoreVersions]]
  * discipline the four corpus tiers already live by:
  *
  *  - the persisted artifact is the distinct word-k-gram SHINGLE SET
  *    (not the eval text — the gate's union-of-shingles rule never
  *    needs doc identity, and the store must not become a second
  *    copy of benchmark material to leak), one pure-replace stage;
  *  - benchmark REVISIONS are manifest flips ([[revise]]): readers
  *    pin a version, in-flight gates keep serving their pinned files
  *    through a concurrent revision (retention), and the snapshot
  *    log makes every historical eval set resolvable;
  *  - a GATED TRANSACTION pins by BATCH ID ([[pinForBatch]]): the
  *    first screen of batch `b` records the store's current snapshot
  *    seq under `_gate/b` BEFORE any tier folds, and every replay of
  *    `b` re-resolves that seq — so a revision landing between a
  *    crash and its replay cannot move the decisions
  *    (CorpusStoreSpec fabricates exactly that). The record also
  *    answers the audit question "which eval set gated batch N".
  *
  * Scale shape: unchanged from the raw-frame gate — eval sets are
  * tiny beside the corpus, so the stored shingle set broadcasts and
  * the batch side stays one linear shingle pass + one groupBy
  * ([[Dedup.contaminationFlags]]' analysis) — minus the per-batch
  * re-shingling of the eval text, which now happens once per
  * revision at [[build]]/[[revise]] time.
  *
  * Single-writer contract per store directory (build/revise); gate
  * reads and pin records need no marker — `_gate` files are
  * immutable once written (create-unique + rename-no-overwrite, so
  * two racing replays of the same batch converge on one record).
  */
object BenchmarkStore {

  private val Stage = "shingles"

  final case class Store(dir: String) {
    /** (snapshot seq, shingle k, pinned shingle frame) of the LIVE
      * revision — one manifest read + one k-file read, no jobs. */
    def pin(s: SparkSession): Pinned = {
      val fs = fsOf(s, dir)
      val seq = StoreVersions.snapshots(fs, dir).lastOption.map(_._1)
        .getOrElse(throw new IllegalStateException(
          s"benchmark store at $dir has no committed revision — " +
            "build() it first"))
      pinAt(s, seq)
    }

    /** The store as of snapshot `seq` — the time-travel read a
      * recorded gate pin resolves through. */
    def pinAt(s: SparkSession, seq: Int): Pinned = {
      val fs = fsOf(s, dir)
      val v = StoreVersions.readAt(fs, dir, seq).versions
        .getOrElse(Stage, throw new IllegalStateException(
          s"benchmark snapshot $seq at $dir names no shingle stage"))
      Pinned(dir, seq, s"$dir/$Stage/$v", readK(fs, s"$dir/$Stage/$v"))
    }
  }

  /** One resolved revision: the version path is immutable, so every
    * read through a Pinned serves the same shingle set. */
  final case class Pinned(dir: String, seq: Int, path: String, k: Int) {
    def shingles(s: SparkSession): DataFrame = s.read.parquet(path)
  }

  private def fsOf(s: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(s.sessionState.newHadoopConf())

  private def readK(fs: FileSystem, versionDir: String): Int = {
    val p = new Path(s"$versionDir/_k")
    val in = fs.open(p)
    try {
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      try src.mkString.trim.toInt finally src.close()
    } finally in.close()
  }

  private def writeRevision(bench: DataFrame, idCol: String,
      textCol: String, dir: String, k: Int): Store = {
    val s = bench.sparkSession
    val fs = fsOf(s, dir)
    val v = StoreVersions.next(fs, dir, Stage)
    Dedup.shingleRows(
        bench.select(col(idCol), col(textCol)), idCol, textCol, k)
      .select(col("s")).distinct()
      .write.mode("overwrite").parquet(v)
    // the shingle width is part of the revision's identity — a gate
    // matching k=3 grams against a k=5 store would under-flag — so
    // it rides the version dir itself (no extra stage, travels with
    // time travel for free)
    val out = fs.create(new Path(s"$v/_k"), true)
    try out.write(s"$k\n".getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    StoreVersions.flip(fs, dir, Map(Stage -> v))
    StoreVersions.gc(s, fs, dir, Seq(Stage))
    Store(dir)
  }

  /** First revision. A pre-versioning/foreign directory is reset; a
    * versioned previous life keeps its snapshot log (readers serve
    * through the rebuild) and this lands as the next revision. */
  def build(bench: DataFrame, idCol: String, textCol: String,
      dir: String, k: Int = 3): Store = {
    val s = bench.sparkSession
    val fs = fsOf(s, dir)
    if (StoreVersions.read(fs, dir).isEmpty)
      StageSwap.remove(fs, new Path(dir))
    else StoreVersions.sweepOrphans(fs, dir, Seq(Stage))
    writeRevision(bench, idCol, textCol, dir, k)
  }

  /** A benchmark REVISION — new eval set (or new k), one flip.
    * In-flight pinned gates keep their files (retention); new
    * transactions pin this revision. */
  def revise(store: Store, bench: DataFrame, idCol: String,
      textCol: String, k: Int = 3): Store = {
    val fs = fsOf(bench.sparkSession, store.dir)
    require(StoreVersions.read(fs, store.dir).nonEmpty,
      s"benchmark store at ${store.dir} was never built")
    StoreVersions.sweepOrphans(fs, store.dir, Seq(Stage))
    writeRevision(bench, idCol, textCol, store.dir, k)
  }

  /** The GATE'S pin: resolve the revision batch `batchId` is gated
    * by — the recorded seq if this batch screened before (the replay
    * path), the live revision otherwise, RECORDED before returning
    * so every later replay of the batch resolves the same eval set.
    * Must be called before any tier folds (CorpusStore's gate does);
    * a crash between the record and the folds replays harmlessly —
    * the record names the same revision the crashed attempt used.
    */
  def pinForBatch(s: SparkSession, store: Store,
      batchId: String): Pinned = {
    require(batchId.nonEmpty, "a gate pin needs a batchId")
    val fs = fsOf(s, store.dir)
    val rec = new Path(s"${store.dir}/_gate/$batchId")
    def recorded(): Option[Int] =
      if (!fs.exists(rec)) None
      else {
        val in = fs.open(rec)
        try {
          val src = scala.io.Source.fromInputStream(in, "UTF-8")
          try Some(src.mkString.trim.toInt) finally src.close()
        } finally in.close()
      }
    recorded() match {
      case Some(seq) => store.pinAt(s, seq)
      case None =>
        val live = store.pin(s)
        fs.mkdirs(rec.getParent)
        // create-unique + rename-NO-overwrite: if a racing replay of
        // the same batch recorded first, its record wins and we
        // re-read — both converge on one revision
        val tmp = new Path(rec.getParent,
          s"${rec.getName}.tmp-${java.util.UUID.randomUUID()}")
        val out = fs.create(tmp, true)
        try out.write(s"${live.seq}\n".getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        if (fs.rename(tmp, rec)) live
        else {
          fs.delete(tmp, false)
          store.pinAt(s, recorded().getOrElse(throw
            new IllegalStateException(
              s"gate record $rec unreadable after a lost rename race")))
        }
    }
  }
}
