package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The round-15 headline: a reader DataFrame planned BEFORE a
  * concurrent maintenance run must collect correct results from its
  * pinned snapshot AFTER the maintenance committed — the
  * serve-while-maintaining contract [[StoreVersions]] provides.
  * Under the old in-place swap protocol these collects threw
  * FileNotFound (the swap renamed the live stage away and deleted
  * the aside copy at commit); with versioned stages + the manifest
  * flip, the pinned version's files survive for
  * [[StoreVersions.RetainVersions]] further maintenance cycles.
  */
class SnapshotIsolationSpec extends SparkSpec {

  private val terms = Seq("join", "vector", "stream")
  private lazy val docs = sf("documents").select("doc_id", "text")
  private lazy val emb = sf("embeddings")
  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("snap-iso").toString

  private def annQueries = emb.filter(col("vec_id") % 100 === 3)
    .select(col("vec_id").as("qid"), col("embedding"))

  test("TEXT: a bm25 reader held across a concurrent compact (a " +
      "destructive rewrite of every stage it scans) collects the " +
      "pinned snapshot's exact scores") {
    val st = TextIndexStore.build(docs, "doc_id", "text",
      s"$tmp/text-compact")
    TextIndexStore.update(st,
      docs.limit(0), "text") // prove maintenance entry composes
    val expected = TextIndexStore.bm25(spark, st, terms)
      .collect().map(_.toString).sorted.toSeq
    // plan the reader NOW (pins the manifest + file listings) ...
    val pinned = TextIndexStore.bm25(spark, st, terms)
    // ... then compact underneath it: postings and doclens are
    // rewritten into new versions and the old ones drop to retained
    TextIndexStore.compact(spark, st)
    assert(pinned.collect().map(_.toString).sorted.toSeq == expected,
      "pinned reader did not serve its snapshot across the compact")
    // and a reader planned AFTER the compact sees the same scores
    // (compact is a pure rewrite)
    assert(TextIndexStore.bm25(spark, st, terms)
      .collect().map(_.toString).sorted.toSeq == expected)
  }

  test("TEXT: a reader held across a DELETE + COMPACT serves the " +
      "PRE-DELETE corpus (its snapshot), while new readers see the " +
      "deletion — at a retention that spans the chain") {
    spark.conf.set(StoreVersions.RetainVersions, "4")
    try {
      val st = TextIndexStore.build(docs, "doc_id", "text",
        s"$tmp/text-del")
      val expected = TextIndexStore.bm25(spark, st, terms)
        .collect().map(_.toString).sorted.toSeq
      val pinned = TextIndexStore.bm25(spark, st, terms)
      val doomed = docs.filter(col("doc_id") % 7 === 3)
      TextIndexStore.delete(st, doomed.select("doc_id"))
      TextIndexStore.compact(spark, st)
      assert(pinned.collect().map(_.toString).sorted.toSeq == expected,
        "pinned reader leaked the concurrent deletion")
      val after = TextIndexStore.bm25(spark, st, terms)
        .collect().map(_.toString).sorted.toSeq
      assert(after != expected && after.size < expected.size,
        "fixture: the deletion should change fresh reads")
    } finally spark.conf.unset(StoreVersions.RetainVersions)
  }

  test("TEXT bucketed: the pinned reader survives compact's table " +
      "re-registration (the catalog points at the new version; the " +
      "pin does not follow it)") {
    val st = TextIndexStore.build(docs, "doc_id", "text",
      s"$tmp/text-bucketed", bucketPostings = 4)
    val expected = TextIndexStore.bm25(spark, st, terms)
      .collect().map(_.toString).sorted.toSeq
    val pinned = TextIndexStore.bm25(spark, st, terms)
    TextIndexStore.update(st,
      docs.limit(0), "text")
    TextIndexStore.compact(spark, st)
    assert(pinned.collect().map(_.toString).sorted.toSeq == expected,
      "pinned bucketed reader broke across the re-registration")
  }

  test("ANN: a search reader held across delete + compact serves " +
      "the pre-delete snapshot; held across a REBUILD it serves the " +
      "old index (search serves THROUGH the re-train)") {
    val d = AnnIndexStore.CorpusDials
    val st = AnnIndexStore.build(emb, "vec_id", "embedding",
      s"$tmp/ann", d.centroidPred, d.seedPred, d.m, d.subDim, d.iters)
    val expected = AnnIndexStore.search(spark, st, annQueries, "qid",
      "embedding", 10).collect().map(_.toString).sorted.toSeq
    val pinned = AnnIndexStore.search(spark, st, annQueries, "qid",
      "embedding", 10)
    AnnIndexStore.delete(st,
      emb.filter(col("vec_id") % 10 === 6).select("vec_id"))
    AnnIndexStore.compact(spark, st)
    assert(pinned.collect().map(_.toString).sorted.toSeq == expected,
      "pinned search leaked the concurrent delete/compact")
    // fresh reads see the deletion
    val after = AnnIndexStore.search(spark, st, annQueries, "qid",
      "embedding", 10)
    assert(after.filter(col("vec_id") % 10 === 6).isEmpty,
      "fresh reads should exclude the deleted vectors")
    // and across a REBUILD on a different corpus: the pinned reader
    // keeps the old snapshot (models + codes flip as ONE), new
    // readers serve the new index
    val pinned2 = AnnIndexStore.search(spark, st, annQueries, "qid",
      "embedding", 10)
    val expected2 = pinned2.collect().map(_.toString).sorted.toSeq
    AnnIndexStore.build(emb.filter(col("vec_id") % 10 =!= 6),
      "vec_id", "embedding", st.dir, d.centroidPred, d.seedPred,
      d.m, d.subDim, d.iters)
    assert(pinned2.collect().map(_.toString).sorted.toSeq == expected2,
      "pinned search broke across the rebuild")
  }

  test("CURATION: a labels reader held across update + delete + " +
      "re-resolve compact (every stage rewritten) collects the " +
      "pinned snapshot; fresh readers see the maintained store") {
    spark.conf.set(StoreVersions.RetainVersions, "4")
    try {
      val st = CurationStore.build(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        s"$tmp/cur-plain")
      val expected = st.labels(spark)
        .collect().map(_.toString).sorted.toSeq
      val pinned = st.labels(spark) // plans (and pins) NOW
      val pinnedSigs = st.signatures(spark)
      val sigN = pinnedSigs.count()
      CurationStore.update(st,
        docs.filter(col("doc_id") % 2 === 1), "text")
      CurationStore.delete(st,
        docs.filter(col("doc_id") % 7 === 3).select("doc_id"))
      CurationStore.compact(spark, st, buckets = 4) // re-resolve path
      assert(pinned.collect().map(_.toString).sorted.toSeq == expected,
        "pinned labels leaked the concurrent maintenance")
      assert(pinnedSigs.count() == sigN,
        "pinned signatures leaked the concurrent maintenance")
      val after = st.labels(spark).collect().map(_.toString).sorted.toSeq
      assert(after != expected, "fixture: maintenance should change " +
        "fresh reads")
      assert(st.signatures(spark)
        .filter(col("doc_id") % 7 === 3).isEmpty,
        "fresh reads should exclude the deleted docs")
    } finally spark.conf.unset(StoreVersions.RetainVersions)
  }

  test("CURATION bucketed: a labelJoin reader held across compact's " +
      "table re-registration serves its snapshot (the catalog moved " +
      "to the new version; the pin does not follow it)") {
    val st0 = CurationStore.build(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
      s"$tmp/cur-bucketed", bucketLabels = 4)
    val corpus = docs.select("doc_id", "text")
    val expected = CurationStore.labelJoin(corpus, st0)
      .collect().map(_.toString).sorted.toSeq
    val pinned = CurationStore.labelJoin(corpus, st0)
    CurationStore.update(st0,
      docs.filter(col("doc_id") % 2 === 1), "text")
    CurationStore.compact(spark, st0, buckets = 4)
    assert(pinned.collect().map(_.toString).sorted.toSeq == expected,
      "pinned labelJoin broke across the re-registration")
    val after = CurationStore.labelJoin(corpus, st0)
      .collect().map(_.toString).sorted.toSeq
    assert(after.size > expected.size,
      "fresh labelJoin should see the folded batch")
  }

  test("TIME-TRAVEL: pinAt(seq) serves each epoch of the flip log " +
      "verbatim — historical scores equal what the store served THEN " +
      "(stats and postings of one flip together), across update and " +
      "delete; a never-committed seq is loud") {
    spark.conf.set(StoreVersions.RetainVersions, "4")
    try {
      val st = TextIndexStore.build(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        s"$tmp/text-tt")
      val fs = new org.apache.hadoop.fs.Path(st.dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      def serve() = TextIndexStore.bm25(spark, st, terms)
        .collect().map(_.toString).sorted.toSeq
      def seqNow() = StoreVersions.snapshots(fs, st.dir).last._1
      val (seq1, at1) = (seqNow(), serve())
      TextIndexStore.update(st, docs.filter(col("doc_id") % 2 === 1),
        "text", batchId = Some("tt1"))
      val (seq2, at2) = (seqNow(), serve())
      TextIndexStore.delete(st,
        docs.filter(col("doc_id") % 7 === 3).select("doc_id"))
      val (seq3, at3) = (seqNow(), serve())
      assert(seq1 < seq2 && seq2 < seq3, "flip log must grow per flip")
      assert(at1 != at2 && at2 != at3,
        "fixture: each epoch should serve differently")
      def at(seq: Int) = TextIndexStore.bm25Of(spark,
          st.pinAt(spark, seq), terms)
        .collect().map(_.toString).sorted.toSeq
      assert(at(seq1) == at1, "pinAt(build epoch) drifted")
      assert(at(seq2) == at2, "pinAt(update epoch) drifted")
      assert(at(seq3) == at3, "pinAt(delete epoch) != live serve")
      intercept[IllegalStateException] { st.pinAt(spark, 9999) }
    } finally spark.conf.unset(StoreVersions.RetainVersions)
  }

  test("TIME-TRAVEL across stores: the curation and ANN pins " +
      "resolve historical membership (labels before a delete; the " +
      "exact counter of the pinned epoch)") {
    spark.conf.set(StoreVersions.RetainVersions, "4")
    try {
      val cur = CurationStore.build(docs, "doc_id", "text",
        s"$tmp/cur-tt")
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val curSeq = StoreVersions.snapshots(fs, cur.dir).last._1
      val labelsThen = cur.labels(spark).count()
      CurationStore.delete(cur,
        docs.filter(col("doc_id") % 5 === 2).select("doc_id"))
      assert(cur.labels(spark).count() < labelsThen,
        "fixture: the delete should shrink live labels")
      assert(cur.pinAt(spark, curSeq).labels(spark).count()
        == labelsThen, "historical curation pin leaked the delete")

      val d = AnnIndexStore.CorpusDials
      val ann = AnnIndexStore.build(emb, "vec_id", "embedding",
        s"$tmp/ann-tt", d.centroidPred, d.seedPred, d.m, d.subDim,
        d.iters)
      val annSeq = StoreVersions.snapshots(fs, ann.dir).last._1
      val nThen = AnnIndexStore.liveCount(spark, ann)
      AnnIndexStore.delete(ann,
        emb.filter(col("vec_id") % 10 === 1).select("vec_id"))
      assert(AnnIndexStore.liveCount(spark, ann) < nThen)
      assert(ann.pinAt(spark, annSeq).stats(spark).head().getLong(0)
        == nThen, "historical ann counter leaked the delete")
    } finally spark.conf.unset(StoreVersions.RetainVersions)
  }

  test("STATS tier: a held monitoring reader survives an update + " +
      "re-derive compact; statsAt reads drift HISTORY (the epoch's " +
      "exact row set)") {
    spark.conf.set(StoreVersions.RetainVersions, "4")
    try {
      val d = sf("documents").select(col("doc_id"), col("text"),
        col("source"))
      val st = StatsStore.build(d, "text", "source", s"$tmp/stats-iso")
      val fs = new org.apache.hadoop.fs.Path(st.dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("source", "docs", "token_occurrences")
          .collect().map(_.toString).sorted.toSeq
      val expected = rows(st.stats(spark))
      val pinned = st.stats(spark) // plans (and pins) NOW
      val seq1 = StoreVersions.snapshots(fs, st.dir).last._1
      StatsStore.update(st, d.filter(col("doc_id") % 3 === 0),
        "text", "source", batchId = Some("iso-1"))
      StatsStore.compact(st, d.filter(col("doc_id") % 5 =!= 0),
        "text", "source")
      assert(rows(pinned) == expected,
        "held monitoring reader leaked the concurrent maintenance")
      assert(rows(st.statsAt(spark, seq1)) == expected,
        "statsAt did not serve the build epoch's exact row set")
      assert(rows(st.stats(spark)) != expected,
        "fixture: the maintenance should change fresh reads")
    } finally spark.conf.unset(StoreVersions.RetainVersions)
  }

  test("ROLLBACK: the undone batch disappears and the store serves " +
      "the restored epoch exactly; the undone batchId folds again; " +
      "rollback reaches across stores; a GC'd target is loud") {
    spark.conf.set(StoreVersions.RetainVersions, "4")
    try {
      // text: build → fold a batch → roll it back → scores restored
      val st = TextIndexStore.build(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        s"$tmp/text-rb")
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(spark.sessionState.newHadoopConf())
      def serve() = TextIndexStore.bm25(spark, st, terms)
        .collect().map(_.toString).sorted.toSeq
      val seq1 = StoreVersions.snapshots(fs, st.dir).last._1
      val at1 = serve()
      val odds = docs.filter(col("doc_id") % 2 === 1)
      TextIndexStore.update(st, odds, "text", batchId = Some("rb1"))
      val at2 = serve()
      assert(at2 != at1, "fixture: the batch should change scores")
      // the replay guard holds BEFORE the rollback...
      TextIndexStore.update(st, odds, "text", batchId = Some("rb1"))
      assert(serve() == at2, "replay of an applied batch must no-op")
      TextIndexStore.rollback(spark, st, seq1)
      assert(serve() == at1,
        "rollback did not restore the epoch's serving exactly")
      // ...and the rollback RE-OPENS the batch id: folding it again
      // is a real fold, landing the same state as the first time
      TextIndexStore.update(st, odds, "text", batchId = Some("rb1"))
      assert(serve() == at2, "an undone batch id must fold again")

      // curation: a takedown rolled back — membership and the exact
      // counter restore together (they flipped as one)
      val cur = CurationStore.build(docs, "doc_id", "text",
        s"$tmp/cur-rb")
      val cSeq = StoreVersions.snapshots(fs, cur.dir).last._1
      val n1 = CurationStore.liveCount(spark, cur)
      CurationStore.delete(cur,
        docs.filter(col("doc_id") % 5 === 2).select("doc_id"))
      assert(CurationStore.liveCount(spark, cur) < n1)
      CurationStore.rollback(spark, cur, cSeq)
      assert(CurationStore.liveCount(spark, cur) == n1 &&
          cur.tombstonesIfAny(spark).isEmpty,
        "curation rollback did not restore membership + counter")

      // a rollback target whose versions retention already GC'd is
      // loud (default retention; two compacts expire the log)
      spark.conf.unset(StoreVersions.RetainVersions)
      val gcSeq = StoreVersions.snapshots(fs, st.dir).last._1
      TextIndexStore.compact(spark, st)
      TextIndexStore.compact(spark, st)
      intercept[IllegalStateException] {
        TextIndexStore.rollback(spark, st, gcSeq)
      }
    } finally spark.conf.unset(StoreVersions.RetainVersions)
  }

  test("CLONE: cloneAt materializes one snapshot as an INDEPENDENT " +
      "store — the epoch exact (batches folded since stay out), no " +
      "propagation in either direction, fresh lineage (the source's " +
      "batch ids fold again), bucketed layout re-registered, and " +
      "the dst-occupied / unknown-seq guards are loud") {
    spark.conf.set(StoreVersions.RetainVersions, "4")
    try {
      val st = TextIndexStore.build(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        s"$tmp/clone-src")
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(spark.sessionState.newHadoopConf())
      def serve(ix: TextIndexStore.Index) =
        TextIndexStore.bm25(spark, ix, terms)
          .collect().map(_.toString).sorted.toSeq
      val seq1 = StoreVersions.snapshots(fs, st.dir).last._1
      val at1 = serve(st)
      TextIndexStore.update(st, docs.filter(col("doc_id") % 2 === 1),
        "text", batchId = Some("cl-b1"))
      val at2 = serve(st)
      assert(at1 != at2, "fixture: the fold should move the serve")
      // the clone is the EPOCH: the folded batch's postings/doclens/
      // stats rows must all be absent (they live inside the same
      // append version dirs — only the file manifest keeps them out)
      val clone = TextIndexStore.cloneAt(spark, st, seq1,
        s"$tmp/clone-dst")
      assert(serve(clone) == at1,
        "clone leaked a batch folded after its epoch")
      // independence, source → clone: a source delete changes the
      // source, never the clone
      TextIndexStore.delete(st,
        docs.filter(col("doc_id") % 7 === 3).select("doc_id"))
      assert(serve(clone) == at1, "a source delete reached the clone")
      // fresh lineage + independence, clone → source: the batch id
      // the SOURCE already folded folds into the clone (no inherited
      // `_applied`), reproducing the source's pre-delete epoch-2
      // serve — and the source keeps its own (deleted) state
      val srcAfterDelete = serve(st)
      TextIndexStore.update(clone,
        docs.filter(col("doc_id") % 2 === 1), "text",
        batchId = Some("cl-b1"))
      assert(serve(clone) == at2,
        "the source's batch id did not fold into the fresh lineage")
      assert(serve(st) == srcAfterDelete,
        "a clone update reached the source")
      // the clone lives its own full life: compact preserves serving
      TextIndexStore.compact(spark, clone)
      assert(serve(clone) == at2, "clone compact changed serving")
      // loud guards: occupied destination; never-committed seq
      intercept[IllegalArgumentException] {
        TextIndexStore.cloneAt(spark, st, seq1, s"$tmp/clone-dst")
      }
      intercept[IllegalStateException] {
        TextIndexStore.cloneAt(spark, st, 9999, s"$tmp/clone-dst2")
      }
      // bucketed store: the copied postings keep their bucket file
      // layout and the clone's catalog table points at ITS location
      val bsrc = TextIndexStore.build(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        s"$tmp/clone-bsrc", bucketPostings = 2)
      val bseq = StoreVersions.snapshots(fs, bsrc.dir).last._1
      val bAt1 = serve(bsrc)
      TextIndexStore.update(bsrc,
        docs.filter(col("doc_id") % 2 === 1), "text",
        batchId = Some("cl-b2"))
      val bclone = TextIndexStore.cloneAt(spark, bsrc, bseq,
        s"$tmp/clone-bdst")
      assert(serve(bclone) == bAt1, "bucketed clone drifted")
      val bname = bclone.postingsTable.getOrElse(
        fail("bucketed clone lost its catalog table"))
      assert(TextIndexStore.tableLocationMatches(spark, bname,
          bclone.pin(spark).postingsPath),
        "clone table does not point at the clone's postings")
      // ANN: the clone's exact counter and codes are the epoch's —
      // a post-epoch delete in the source never reaches them
      val d = AnnIndexStore.CorpusDials
      val ann = AnnIndexStore.build(emb, "vec_id", "embedding",
        s"$tmp/clone-asrc", d.centroidPred, d.seedPred, d.m, d.subDim,
        d.iters)
      val annSeq = StoreVersions.snapshots(fs, ann.dir).last._1
      val n1 = AnnIndexStore.liveCount(spark, ann)
      AnnIndexStore.delete(ann,
        emb.filter(col("vec_id") % 10 === 1).select("vec_id"))
      val aclone = AnnIndexStore.cloneAt(spark, ann, annSeq,
        s"$tmp/clone-adst")
      assert(AnnIndexStore.liveCount(spark, aclone) == n1,
        "ann clone counter != epoch count")
      assert(aclone.codes(spark).count() == n1,
        "ann clone codes leaked the source's post-epoch delete")
      assert(AnnIndexStore.liveCount(spark, ann) < n1,
        "fixture: the source delete should have landed")
    } finally spark.conf.unset(StoreVersions.RetainVersions)
  }

  test("retention bounds the disk: after two maintenance cycles the " +
      "oldest version is GC'd (a pin older than retention expires, " +
      "the Iceberg contract) — and the snapshot LOG is bounded to " +
      "retain + 1, expired seqs loud") {
    val st = TextIndexStore.build(docs, "doc_id", "text",
      s"$tmp/text-gc")
    val fs = new org.apache.hadoop.fs.Path(st.dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val v1 = StoreVersions.resolve(fs, st.dir, "postings")
    val seq1 = StoreVersions.snapshots(fs, st.dir).last._1
    TextIndexStore.compact(spark, st)
    assert(fs.exists(new org.apache.hadoop.fs.Path(v1)),
      "one cycle should RETAIN the prior version for in-flight " +
        "readers")
    TextIndexStore.compact(spark, st)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(v1)),
      "two cycles should GC the expired version")
    assert(StoreVersions.snapshots(fs, st.dir).size <= 2,
      "snapshot log must stay bounded at retain + 1")
    intercept[IllegalStateException] { st.pinAt(spark, seq1) }
  }

  test("StoreVersions: flip merges over the current manifest " +
      "atomically; sweepOrphans removes only above-current; gc " +
      "keeps current + retain below") {
    val dir = s"$tmp/unit"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    def mk(stage: String, n: Int): Unit = fs.mkdirs(
      new org.apache.hadoop.fs.Path(f"$dir/$stage/v-$n%05d"))
    mk("a", 1); mk("b", 1)
    StoreVersions.flip(fs, dir,
      Map("a" -> s"$dir/a/v-00001", "b" -> s"$dir/b/v-00001"))
    assert(StoreVersions.read(fs, dir) ==
      Map("a" -> "v-00001", "b" -> "v-00001"))
    // a partial update flips only its stages; the rest carry over
    mk("a", 2)
    StoreVersions.flip(fs, dir, Map("a" -> s"$dir/a/v-00002"))
    assert(StoreVersions.read(fs, dir) ==
      Map("a" -> "v-00002", "b" -> "v-00001"))
    assert(StoreVersions.resolve(fs, dir, "a") == s"$dir/a/v-00002")
    // next() skips past both on-disk and manifest numbering
    assert(StoreVersions.next(fs, dir, "a") == s"$dir/a/v-00003")
    // orphans: only ABOVE the current version is swept
    mk("a", 7)
    StoreVersions.sweepOrphans(fs, dir, Seq("a", "b"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/a/v-00007")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/a/v-00001")),
      "sweep must never touch retained prior versions")
    // gc: current + retain(=1) prior survive, older die
    mk("a", 3); mk("a", 4)
    StoreVersions.flip(fs, dir, Map("a" -> s"$dir/a/v-00004"))
    StoreVersions.gc(spark, fs, dir, Seq("a", "b"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/a/v-00001")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/a/v-00002")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/a/v-00003")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/a/v-00004")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/b/v-00001")),
      "gc of a stage with no priors must keep its current")
    // a resolve against a never-built store is loud
    intercept[IllegalStateException] {
      StoreVersions.resolve(fs, s"$tmp/absent", "a")
    }
  }
}
