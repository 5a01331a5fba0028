package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The staged store must be a pure MATERIALIZATION: feeding a
  * consumer from the parquet stages yields frames IDENTICAL to the
  * fused standalone operators (same kernels, same dials), and the
  * build itself leaves no cached state behind.
  */
class CurationStoreSpec extends SparkSpec {

  private lazy val docs = sf("documents")
  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("curation-store").toString
  private lazy val store = CurationStore.build(docs, "doc_id", "text", tmp)

  private def standalonePairs =
    Dedup.minhashEstimatePairs(docs, "doc_id", "text",
        numHashes = 16, numBands = 4)
      .filter(col("est_jaccard") >= 0.5)

  private def assertFrameEqual(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, what: String): Unit = {
    assert(a.count() == b.count(), s"$what: row counts differ")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what: symmetric difference is non-empty")
  }

  test("stored pairs equal the fused estimate tier's pairs") {
    assertFrameEqual(store.pairs(spark), standalonePairs, "pairs")
  }

  test("stored labels equal the live fixpoint's labels") {
    val fixpoint = Dedup.clusters(standalonePairs, "a", "b")
    assertFrameEqual(store.labels(spark),
      fixpoint.select(col("id").as("doc_id"), col("cluster")), "labels")
    fixpoint.unpersist()
  }

  test("store-fed corpus rewrite equals the standalone operator") {
    assertFrameEqual(
      Dedup.dedupCorpusLabeled(docs, "doc_id", store.labels(spark)),
      Dedup.dedupCorpus(docs, "doc_id", standalonePairs),
      "dedupCorpus")
  }

  test("store-fed best-of-cluster decisions equal the standalone operator") {
    val scored = TextOps.qualityClassify(docs, "doc_id", "text", 4096)
      .select(col("doc_id"), col("prob"))
    assertFrameEqual(
      Dedup.dedupCorpusBestLabeled(scored, "doc_id",
        store.labels(spark), "prob"),
      Dedup.dedupCorpusBest(scored, "doc_id", standalonePairs, "prob"),
      "dedupCorpusBest")
  }

  test("bucketed labels join a same-bucketed corpus with ZERO exchanges") {
    // the serving layout the class scaladoc claims for cluster scale:
    // labels written bucketBy(idCol) THROUGH the store, corpus
    // bucketed the same way — the consumer's label join must plan
    // with no exchange on either side (shuffle paid once at write)
    val wh = java.nio.file.Files
      .createTempDirectory("curation-bucketed").toString
    val bStore = CurationStore.build(docs, "doc_id", "text",
      s"$wh/store", bucketLabels = 8)
    assert(bStore.labelsTable.isDefined)
    docs.write.format("parquet").bucketBy(8, "doc_id").sortBy("doc_id")
      .option("path", s"$wh/docs")
      .mode("overwrite").saveAsTable("docs_bucketed_spec")
    // forbid broadcast so the claim is about co-location, not size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("docs_bucketed_spec")
        .join(bStore.labels(spark), "doc_id")
        .select(col("doc_id"), col("cluster"), col("source"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty,
        s"label join must be exchange-free:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      assert(p.contains("Bucketed: true"), p)
      // same rows as the plain store's labels joined the plain way
      assertFrameEqual(joined,
        docs.join(store.labels(spark), "doc_id")
          .select(col("doc_id"), col("cluster"), col("source")),
        "bucketed label join")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS docs_bucketed_spec")
      bStore.labelsTable.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("incremental update equals a from-scratch rebuild, stage by stage") {
    // build(evens) then update(odds) must land byte-equivalent stage
    // CONTENT to build(all) — the identity the 100 TB daily ingest
    // stands on (and the one q126 pins against the DuckDB oracle)
    val dir3 =
      java.nio.file.Files.createTempDirectory("curation-store-incr").toString
    val incr = CurationStore.update(
      CurationStore.build(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", dir3),
      docs.filter(col("doc_id") % 2 === 1), "text")
    assertFrameEqual(incr.signatures(spark), store.signatures(spark),
      "incremental signatures")
    assertFrameEqual(incr.pairs(spark), store.pairs(spark),
      "incremental pairs")
    assertFrameEqual(incr.labels(spark), store.labels(spark),
      "incremental labels")
    // and the batch-vs-store join really never re-shingled history:
    // the signature stage gained EXACTLY the odd-id rows
    assert(incr.signatures(spark).filter(col("doc_id") % 2 === 1).count()
      == store.signatures(spark).filter(col("doc_id") % 2 === 1).count())
  }

  test("bucketed store stays maintainable: delta update, zero-exchange " +
      "labelJoin, compaction folds the delta back in") {
    val wh = java.nio.file.Files
      .createTempDirectory("curation-compact").toString
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val odds = docs.filter(col("doc_id") % 2 === 1)
    // upgrade path: compact() buckets a PLAIN store in place
    val plain = CurationStore.build(evens, "doc_id", "text", s"$wh/store")
    val bucketed = CurationStore.compact(spark, plain, 8)
    assert(bucketed.labelsTable.isDefined)
    assertFrameEqual(bucketed.labels(spark), plain.labels(spark),
      "compaction must not change the label map")
    // maintenance on the read-optimized layout: the batch lands in
    // the delta stage, the base table's files are untouched
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val basePath = bucketed.pin(spark).labelsPath
    val baseFiles = UpdateMarker.listFiles(fs, basePath)
    CurationStore.update(bucketed, odds, "text")
    assert(bucketed.pin(spark).labelsPath == basePath &&
        UpdateMarker.listFiles(fs, basePath) == baseFiles,
      "the bucketed base must be immutable under update")
    assert(bucketed.deltaIfAny(spark).exists(_.count() > 0),
      "the batch's label changes must land in the delta")
    // effective labels == the from-scratch rebuild (the same
    // equivalence the plain store's update law proves)
    assertFrameEqual(bucketed.labels(spark), store.labels(spark),
      "bucketed update law")
    docs.write.format("parquet").bucketBy(8, "doc_id").sortBy("doc_id")
      .option("path", s"$wh/docs")
      .mode("overwrite").saveAsTable("docs_compact_spec")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      def joined() = CurationStore.labelJoin(
        spark.table("docs_compact_spec"), bucketed)
        .select(col("doc_id"), col("cluster"), col("source"))
      def assertNoExchange(tag: String) = {
        val j = joined()
        j.collect()
        val p = j.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty,
          s"$tag: label join must stay exchange-free:\n$p")
      }
      // (a) WITH the delta outstanding: base join bucketed, delta
      // rides in as broadcasts — still no shuffle exchange
      assertNoExchange("delta outstanding")
      assertFrameEqual(joined(),
        docs.join(store.labels(spark), "doc_id")
          .select(col("doc_id"), col("cluster"), col("source")),
        "labelJoin over base+delta")
      // (b) compaction folds the delta in: the delta stage flips to
      // a fresh EMPTY version, joins unchanged
      val compacted = CurationStore.compact(spark, bucketed, 8)
      assert(compacted.deltaIfAny(spark).isEmpty,
        "compaction must clear the folded delta")
      val j2 = CurationStore.labelJoin(
        spark.table("docs_compact_spec"), compacted)
        .select(col("doc_id"), col("cluster"), col("source"))
      j2.collect()
      val p2 = j2.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert("Exchange hashpartitioning".r.findAllIn(p2).isEmpty, p2)
      assert(p2.contains("Bucketed: true"), p2)
      assertFrameEqual(j2,
        docs.join(store.labels(spark), "doc_id")
          .select(col("doc_id"), col("cluster"), col("source")),
        "labelJoin post-compaction")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS docs_compact_spec")
      bucketed.labelsTable
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("compact's catalog window: with the table dropped, labels and " +
      "labelJoin degrade to correct file scans and compact re-runs") {
    val wh = java.nio.file.Files
      .createTempDirectory("curation-catalog-window").toString
    val plain = CurationStore.build(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
      s"$wh/store")
    val bucketed = CurationStore.compact(spark, plain, 8)
    val expect = bucketed.labels(spark).collect().map(_.toString).toSet
    // fabricate a crash inside the DROP..CREATE re-registration
    // window: the table is gone, the files are committed
    spark.sql(s"DROP TABLE ${bucketed.labelsTable.get}")
    assert(bucketed.labels(spark).collect().map(_.toString).toSet
      == expect, "labels() must fall back to the files")
    assert(CurationStore.labelJoin(docs.select("doc_id"), bucketed)
      .count() == expect.size, "labelJoin must fall back too")
    // the scheduled daily update must also keep running inside the
    // window (its base-diff degrades to the same file scan) — and
    // still land the correct effective label map
    CurationStore.update(bucketed,
      docs.filter(col("doc_id") % 2 === 1), "text")
    assertFrameEqual(bucketed.labels(spark), store.labels(spark),
      "update inside the catalog window")
    // the scaladoc's prescribed recovery: re-invoke compact
    val expect2 = bucketed.labels(spark).collect().map(_.toString).toSet
    val healed = CurationStore.compact(spark, bucketed, 8)
    assert(spark.catalog.tableExists(healed.labelsTable.get))
    assert(healed.labels(spark).collect().map(_.toString).toSet
      == expect2, "re-compaction restores the registered layout")
  }

  test("update survives empty, shingle-less, and pairless batches") {
    // the quiet-day cases of the daily ingest: a batch with nothing
    // in it, a batch whose docs are too short to shingle, and a batch
    // of genuinely novel docs that add no pairs — none may throw, and
    // none may disturb stages it didn't add to
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory("curation-store-edge").toString
    val base = CurationStore.build(docs.filter(col("doc_id") < 50),
      "doc_id", "text", dir)
    val sigN = base.signatures(spark).count()
    val pairN = base.pairs(spark).count()
    val labels0 = base.labels(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def labelsNow() = base.labels(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    CurationStore.update(base,
      docs.filter(org.apache.spark.sql.functions.lit(false)), "text")
    assert(base.signatures(spark).count() == sigN, "empty batch: sigs")
    assert(base.pairs(spark).count() == pairN, "empty batch: pairs")
    assert(labelsNow() == labels0, "empty batch: labels")

    CurationStore.update(base,
      Seq((9001L, "a b")).toDF("doc_id", "text"), "text")
    assert(base.signatures(spark).count() == sigN,
      "shingle-less batch: sigs")
    assert(base.pairs(spark).count() == pairN,
      "shingle-less batch: pairs")
    assert(labelsNow() == labels0, "shingle-less batch: labels")

    CurationStore.update(base,
      Seq((9002L, "zq1 zq2 zq3 zq4 zq5")).toDF("doc_id", "text"),
      "text")
    assert(base.signatures(spark).count() == sigN + 1,
      "novel batch: its signature row must append")
    assert(base.pairs(spark).count() == pairN, "novel batch: pairs")
    assert(labelsNow() == labels0, "novel batch: labels")
  }

  test("crashed update's partial appends are dropped; re-run is exactly-once") {
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val odds = docs.filter(col("doc_id") % 2 === 1)
    def tmpDir() =
      java.nio.file.Files.createTempDirectory("curation-crash").toString
    // the single-application truth
    val clean = CurationStore.update(
      CurationStore.build(evens, "doc_id", "text", tmpDir()),
      odds, "text")

    // crash simulation: stage 1's signature append LANDED, then the
    // run died before the label swap — the state the r11 review
    // flagged: a naive re-run would re-append every signature row
    val dir = tmpDir()
    val crashed = CurationStore.build(evens, "doc_id", "text", dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // the marker a real update writes: every stage's listing at its
    // PINNED version path (the stageMap shape — including stats, the
    // flip-commit stage whose unchanged listing marks "uncommitted")
    val snap = crashed.pin(spark)
    def files(p: String) = UpdateMarker.listFiles(fs, p)
    UpdateMarker.write(fs, UpdateMarker.markerPath(dir),
      UpdateMarker.State("", Map(
        "sig" -> files(snap.sigPath), "pairs" -> files(snap.pairsPath),
        "tomb" -> files(snap.tombsPath),
        "labels" -> files(snap.labelsPath),
        "stats" -> files(snap.statsPath))))
    Dedup.minhashSignatures(odds, "doc_id", "text", 16)
      .write.mode("append").parquet(snap.sigPath)
    spark.catalog.refreshByPath(snap.sigPath)

    // re-run the whole update — recovery must drop the partial append
    val rerun = CurationStore.update(crashed, odds, "text")
    assertFrameEqual(rerun.signatures(spark), clean.signatures(spark),
      "signatures after crash + re-run")
    assertFrameEqual(rerun.pairs(spark), clean.pairs(spark),
      "pairs after crash + re-run")
    assertFrameEqual(rerun.labels(spark), clean.labels(spark),
      "labels after crash + re-run")
    assert(!fs.exists(UpdateMarker.markerPath(dir)),
      "a completed update must clean its marker up")
  }

  test("exact live-membership counter: liveCount == masked signature " +
      "count through build/update/delete/compact, is COMMIT-ATOMIC " +
      "with the store (a crashed update cannot skew it), and " +
      "settlement heals the partial append back to equality") {
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val odds = docs.filter(col("doc_id") % 2 === 1)
    val dir = java.nio.file.Files
      .createTempDirectory("curation-counter").toString
    val st = CurationStore.build(evens, "doc_id", "text", dir)
    def probe(): Long = CurationStore.liveCount(spark, st)
    def truth(): Long = st.signatures(spark).count()
    assert(probe() == truth(), "counter wrong after build")
    CurationStore.update(st, odds, "text", batchId = Some("k1"))
    assert(probe() == truth(), "counter wrong after update")
    val doomed = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
    CurationStore.delete(st, doomed, batchId = Some("k2"))
    assert(probe() == truth(), "counter wrong after delete")
    // batchId replays must not re-fold the counter
    CurationStore.delete(st, doomed, batchId = Some("k2"))
    assert(probe() == truth(), "counter drifted on delete replay")
    // keyless re-delete of already-tombstoned ids decrements nothing
    CurationStore.delete(st, doomed)
    assert(probe() == truth(), "re-deleting tombstoned ids drifted")

    // crash fabrication: a died update left its marker and a partial
    // signature append inside the current signatures version. The
    // counter flips in the SAME manifest flip as the label commit,
    // so before settlement it still names the COMMITTED membership
    // exactly (never a torn fold), even while the raw signature scan
    // is skewed by the partial append; the next writer's settlement
    // heals the append and restores scan == counter.
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val snap = st.pin(spark)
    def files(p: String) = UpdateMarker.listFiles(fs, p)
    val preTruth = truth()
    UpdateMarker.write(fs, UpdateMarker.markerPath(dir),
      UpdateMarker.State("", Map(
        "sig" -> files(snap.sigPath), "pairs" -> files(snap.pairsPath),
        "tomb" -> files(snap.tombsPath),
        "labels" -> files(snap.labelsPath),
        "stats" -> files(snap.statsPath))))
    Dedup.minhashSignatures(
        docs.filter(col("doc_id") % 11 === 5)
          .withColumn("doc_id", col("doc_id") + 1000000),
        "doc_id", "text", 16)
      .write.mode("append").parquet(snap.sigPath)
    spark.catalog.refreshByPath(snap.sigPath)
    assert(truth() > preTruth,
      "fixture: the partial append must skew the raw scan")
    assert(probe() == preTruth,
      "commit-atomic counter skewed by an uncommitted append")
    CurationStore.compact(spark, st, buckets = 4)
    assert(CurationStore.liveCount(spark, st) == preTruth,
      "counter not preserved through settlement + compaction")
    assert(CurationStore.liveCount(spark, st) ==
      st.signatures(spark).count(),
      "counter != masked signatures after crash settlement")
  }

  test("committed label swap with a stale marker: same batchId is a no-op") {
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val odds = docs.filter(col("doc_id") % 2 === 1)
    val dir = java.nio.file.Files
      .createTempDirectory("curation-acked").toString
    val store = CurationStore.build(evens, "doc_id", "text", dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // pre-update listings at the PINNED version paths (the marker a
    // real update writes); after the update commits, the flipped
    // stats stage resolves to a DIFFERENT directory, so the stale
    // marker's listing-diff reads "committed"
    val snap = store.pin(spark)
    def files(p: String) = UpdateMarker.listFiles(fs, p)
    val pre = Map("sig" -> files(snap.sigPath),
      "pairs" -> files(snap.pairsPath), "tomb" -> files(snap.tombsPath),
      "labels" -> files(snap.labelsPath),
      "stats" -> files(snap.statsPath))
    CurationStore.update(store, odds, "text", batchId = Some("day-3"))
    val sigCount = store.signatures(spark).count()
    // resurrect the marker as if the post-commit delete never ran
    UpdateMarker.write(fs, UpdateMarker.markerPath(dir),
      UpdateMarker.State("day-3", pre))
    CurationStore.update(store, odds, "text", batchId = Some("day-3"))
    assert(store.signatures(spark).count() == sigCount,
      "a committed batch's re-run must not re-append signatures")
  }

  test("oversized delta: label reads degrade to the shuffle shape " +
      "instead of broadcasting an unbounded frame") {
    val wh = java.nio.file.Files
      .createTempDirectory("curation-delta-guard").toString
    val bucketed = CurationStore.compact(spark, CurationStore.build(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
      s"$wh/store"), 8)
    CurationStore.update(bucketed,
      docs.filter(col("doc_id") % 2 === 1), "text")
    assert(bucketed.deltaIfAny(spark).isDefined, "delta expected")
    val expect = docs.join(store.labels(spark), "doc_id")
      .select(col("doc_id"), col("cluster"))
      .collect().map(_.toString).toSet
    // suppress Spark's own size-based broadcasts so any
    // BroadcastExchange in the plan can only come from our hints
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      // a zero ceiling fabricates "delta outgrew the broadcast
      // budget": both labels() and labelJoin() must drop their
      // broadcast hints and still return the same rows
      spark.conf.set(CurationStore.DeltaBroadcastMaxBytes, "0")
      val j = CurationStore.labelJoin(docs, bucketed)
        .select(col("doc_id"), col("cluster"))
      assert(j.collect().map(_.toString).toSet == expect,
        "guarded shape must return identical rows")
      val p = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!p.contains("BroadcastExchange"),
        s"guard must suppress the delta broadcasts:\n$p")
      // back under the ceiling the broadcast shape returns
      spark.conf.set(CurationStore.DeltaBroadcastMaxBytes,
        (64L * 1024 * 1024).toString)
      val j2 = CurationStore.labelJoin(docs, bucketed)
        .select(col("doc_id"), col("cluster"))
      assert(j2.collect().map(_.toString).toSet == expect)
      assert(j2.queryExecution.executedPlan.toString
        .contains("BroadcastExchange"))
    } finally {
      spark.conf.unset(CurationStore.DeltaBroadcastMaxBytes)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      bucketed.labelsTable
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("compact settles a crashed update's marker and leaves none of " +
      "its own behind; simultaneous entry still collides") {
    val wh = java.nio.file.Files
      .createTempDirectory("curation-compact-marker").toString
    val dir = s"$wh/store"
    val bucketed = CurationStore.compact(spark, CurationStore.build(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", dir), 8)
    CurationStore.update(bucketed,
      docs.filter(col("doc_id") % 2 === 1), "text")
    val expect = bucketed.labels(spark).collect().map(_.toString).toSet
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // fabricate an update that crashed pre-commit: marker snapshots
    // the current PINNED listings (the stageMap shape — "labels"
    // maps to the delta on a bucketed store), a partial signature
    // append sits inside the current signatures version
    val snap = bucketed.pin(spark)
    def files(p: String) = UpdateMarker.listFiles(fs, p)
    val marker = UpdateMarker.markerPath(dir)
    UpdateMarker.write(fs, marker, UpdateMarker.State("b9",
      Map("sig" -> files(snap.sigPath), "pairs" -> files(snap.pairsPath),
        "tomb" -> files(snap.tombsPath),
        "labels" -> files(snap.deltaPath),
        "stats" -> files(snap.statsPath))))
    val junk = new org.apache.hadoop.fs.Path(
      s"${snap.sigPath}/part-junk.parquet")
    docs.limit(1).select("doc_id").write.mode("overwrite")
      .parquet(s"$wh/junkfile")
    fs.rename(new org.apache.hadoop.fs.Path(
      UpdateMarker.listFiles(fs, s"$wh/junkfile").head), junk)
    // a live writer holding the marker makes a SIMULTANEOUS entry's
    // own marker write fail loudly (the documented collision)
    intercept[IllegalStateException] {
      UpdateMarker.write(fs, marker, UpdateMarker.State("b10", Map()))
    }
    // compact settles the crashed predecessor: partial append
    // dropped BEFORE the fold, no marker left at exit, labels intact
    val healed = CurationStore.compact(spark, bucketed, 8)
    assert(!fs.exists(junk),
      "crashed update's partial append must be dropped, not folded")
    assert(!fs.exists(marker), "compact must release the marker")
    assert(healed.labels(spark).collect().map(_.toString).toSet
      == expect, "labels unchanged by settle + compaction")
    healed.labelsTable
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("build leaves no persisted blocks behind") {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val dir2 =
      java.nio.file.Files.createTempDirectory("curation-store2").toString
    CurationStore.build(docs, "doc_id", "text", dir2)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "store build left persisted blocks")
  }

  test("stage artifacts are mutually consistent") {
    val sig = store.signatures(spark)
    val pairs = store.pairs(spark)
    val labels = store.labels(spark)
    // every pair id is a signed doc; every labeled doc is in a pair
    val pairIds = pairs.select(col("a").as("doc_id"))
      .union(pairs.select(col("b").as("doc_id"))).distinct()
    assert(pairIds.join(sig, "doc_id", "left_anti").isEmpty,
      "pair references an unsigned doc")
    assertFrameEqual(labels.select("doc_id"), pairIds, "labeled ids")
    // estimate threshold respected in the stored pairs
    assert(pairs.filter(col("est_jaccard") < 0.5).isEmpty)
    // cluster label = component minimum → every cluster id labels itself
    assert(labels.select(col("cluster").as("doc_id")).distinct()
      .join(labels.filter(col("doc_id") === col("cluster")), "doc_id",
        "left_anti").isEmpty,
      "a cluster's canonical id is missing its own label row")
  }

  test("delete masks membership immediately (labels/sig/pairs/" +
      "labelJoin); delete-then-compact == rebuild without the docs, " +
      "stage by stage; re-add guarded; replay a no-op") {
    val doomPred = col("doc_id") % 11 === 5
    val doomed = docs.filter(doomPred).select("doc_id")
    val st = CurationStore.build(docs, "doc_id", "text", s"$tmp-del")
    CurationStore.delete(st, doomed, Some("takedown"))
    // membership masks on every read surface
    for ((df, what) <- Seq(
        (st.labels(spark).select(col("doc_id")), "labels"),
        (st.signatures(spark).select(col("doc_id")), "signatures"),
        (st.pairs(spark).select(col("a").as("doc_id")), "pairs.a"),
        (st.pairs(spark).select(col("b").as("doc_id")), "pairs.b"),
        (CurationStore.labelJoin(docs, st).select(col("doc_id")),
          "labelJoin")))
      assert(df.join(doomed, Seq("doc_id"), "left_semi").isEmpty,
        s"$what still serves a deleted doc")
    // replay (keyed) and re-run (keyless) grow nothing
    val tombCount = spark.read.parquet(st.tombDir(spark)).count()
    CurationStore.delete(st, doomed, Some("takedown"))
    CurationStore.delete(st, doomed)
    assert(spark.read.parquet(st.tombDir(spark)).count() == tombCount)
    // deleting a NEVER-STORED id is a no-op: no tombstone row, and a
    // later update() of that id is not blocked by the re-add guard
    import spark.implicits._
    val phantomId = 999999999L
    CurationStore.delete(st, Seq(phantomId).toDF("doc_id"))
    assert(spark.read.parquet(st.tombDir(spark)).count() == tombCount,
      "a never-stored id grew the tombstone set")
    CurationStore.update(st,
      Seq((phantomId, "phantom arrives after its takedown notice"))
        .toDF("doc_id", "text"), "text")
    assert(st.signatures(spark).filter(col("doc_id") === phantomId)
      .count() == 1, "phantom-delete blocked a later update")
    CurationStore.delete(st, Seq(phantomId).toDF("doc_id"))
    // re-adding a tombstoned id fails loudly until compact
    val e = intercept[IllegalArgumentException] {
      CurationStore.update(st, docs.filter(doomPred).limit(2), "text")
    }
    assert(e.getMessage.contains("tombstoned"))
    // an update of genuinely new docs COMPOSES with the outstanding
    // tombstones: the batch must not pair against deleted signatures
    val st2 = CurationStore.build(docs.filter(col("doc_id") % 3 =!= 0),
      "doc_id", "text", s"$tmp-del-compose")
    CurationStore.delete(st2,
      docs.filter(col("doc_id") % 3 =!= 0 && doomPred)
        .select("doc_id"))
    CurationStore.update(st2,
      docs.filter(col("doc_id") % 3 === 0 && !doomPred), "text")
    assert(st2.pairs(spark)
      .select(col("a").as("doc_id")).union(
        st2.pairs(spark).select(col("b").as("doc_id")))
      .join(doomed, Seq("doc_id"), "left_semi").isEmpty,
      "an update paired new docs against deleted signatures")
    // compact re-resolves: the store now equals a rebuild WITHOUT
    // the deleted docs, stage for stage (topology included — any
    // cluster a deleted bridge doc held together splits here)
    val compacted = CurationStore.compact(spark, st, buckets = 4)
    assert(compacted.tombstonesIfAny(spark).isEmpty,
      "tombstones survived compact")
    val without = CurationStore.build(docs.filter(!doomPred),
      "doc_id", "text", s"$tmp-del-rebuild")
    assertFrameEqual(compacted.signatures(spark),
      without.signatures(spark), "post-compact signatures")
    assertFrameEqual(compacted.pairs(spark), without.pairs(spark),
      "post-compact pairs")
    assertFrameEqual(compacted.labels(spark), without.labels(spark),
      "post-compact labels")
    // the ids are free again after compact
    CurationStore.update(compacted, docs.filter(doomPred), "text")
    assertFrameEqual(compacted.signatures(spark),
      CurationStore.build(docs, "doc_id", "text", s"$tmp-del-full")
        .signatures(spark),
      "re-added signatures")
  }

  test("deleting a BRIDGE doc splits its cluster at compact " +
      "(planted near-dup chain A~B~C where A,C differ)") {
    import spark.implicits._
    // B is A's text followed by C's text: with word-3-gram shingles
    // J(A,B) = J(B,C) = 0.4 and J(A,C) = 0 (no shared shingle).
    // 16 one-row bands make the J=0.4 candidates near-certain while
    // the estimate cut (0.2) still rejects the A~C noise floor.
    val a = "alpha beta gamma delta epsilon zeta"
    val c = "one two three four five six"
    val b = s"$a $c"
    val planted = Seq((1L, a), (2L, b), (3L, c),
      (10L, "completely different text here now okay"),
      (11L, "another unrelated document goes right there"))
      .toDF("doc_id", "text")
    val st = CurationStore.build(planted, "doc_id", "text",
      s"$tmp-bridge", numHashes = 16, numBands = 16, minEst = 0.2)
    val lab0 = st.labels(spark).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // precondition: the chain is one cluster through B
    assume(lab0.get(1L).isDefined && lab0.get(3L).isDefined &&
      lab0(1L) == lab0(3L), s"fixture did not chain: $lab0")
    val directAC = st.pairs(spark)
      .filter((col("a") === 1L && col("b") === 3L) ||
        (col("a") === 3L && col("b") === 1L)).isEmpty
    assume(directAC, "fixture has a direct A~C pair; bridge test void")
    CurationStore.delete(st, Seq(2L).toDF("doc_id"))
    // masked serving still shows the STALE merge (documented: the
    // topology refreshes at compact)
    val lab1 = st.labels(spark).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!lab1.contains(2L), "deleted doc still labeled")
    val compacted = CurationStore.compact(spark, st, buckets = 2)
    val lab2 = compacted.labels(spark).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!lab2.contains(2L))
    // the split: A and C no longer share a cluster (here they drop
    // out of the labels entirely — no pair remains, and labels cover
    // only paired docs, the store's standing contract)
    assert(!(lab2.contains(1L) && lab2.contains(3L) &&
        lab2(1L) == lab2(3L)),
      s"bridge deletion did not split the cluster: $lab2")
    // and the store equals a rebuild without the bridge doc: the
    // remaining corpus has no qualifying pair (A~C share nothing,
    // the fillers match nothing), so the rebuild's labels are EMPTY
    // — which is exactly what the re-resolve produced
    assert(lab2.isEmpty,
      s"post-compact labels differ from the rebuild's (expected " +
        s"empty): $lab2")
    val remainingPairs = Dedup.minhashEstimatePairs(
        planted.filter(col("doc_id") =!= 2L), "doc_id", "text",
        numHashes = 16, numBands = 16)
      .filter(col("est_jaccard") >= 0.2)
    assert(remainingPairs.isEmpty,
      "fixture assumption broken: the remaining corpus has pairs")
  }

  test("screen against the stored signatures equals the fused " +
      "incremental operator") {
    val hist = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val st = CurationStore.build(hist, "doc_id", "text", s"$tmp-screen")
    // compare MATERIALIZED maps, not exceptAll: the two frames share
    // the batch's lineage and each embeds a persisted components
    // fixpoint, a combination whose single exceptAll plan mis-pairs
    // the re-aliased cached subtrees (collected results are stable
    // and identical; the one-plan set difference reports all rows)
    def decided(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val fromStore = decided(CurationStore.screen(spark, st, batch, "text"))
    val fused = decided(Dedup.incrementalDecisions(batch,
      Dedup.minhashSignatures(hist, "doc_id", "text", 16),
      "doc_id", "text"))
    assert(fromStore.nonEmpty && fromStore == fused,
      s"screen decisions drifted from the fused operator: " +
        s"${(fromStore.toSet -- fused.toSet).take(5)} vs " +
        s"${(fused.toSet -- fromStore.toSet).take(5)}")
  }

  test("screenAttributed: dropping dup_of recovers screen exactly; " +
      "kept iff unattributed; hist winners live in the store, batch " +
      "canonicals in the batch below their members") {
    val hist = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val st = CurationStore.build(hist, "doc_id", "text", s"$tmp-attr")
    val attributed = CurationStore
      .screenAttributed(spark, st, batch, "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val plain = CurationStore.screen(spark, st, batch, "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(attributed.map(t => t._1 -> t._2).toMap == plain,
      "projection away from dup_of drifted from screen")
    assert(attributed.exists(_._2 == "hist_dup") &&
      attributed.exists(_._2 == "batch_dup"), "fixture has no dups")
    attributed.foreach { case (id, status, dupOf) =>
      assert((status == "kept") == dupOf.isEmpty,
        s"doc $id: status $status with dup_of $dupOf")
      if (status == "hist_dup")
        assert(dupOf.get % 2 == 0, s"doc $id: hist winner not stored")
      if (status == "batch_dup")
        assert(dupOf.get % 2 == 1 && dupOf.get < id,
          s"doc $id: canonical ${dupOf.get} not a smaller batch id")
    }
  }

  test("screenDecontaminated: contamination overrides every dedup " +
      "status, clean decisions pass through unchanged") {
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val benchText = "secret eval question one two three four five"
    val st = CurationStore.build(
      Seq((2L, a), (4L, "totally different filler content going here"))
        .toDF("doc_id", "text"),
      "doc_id", "text", s"$tmp-decon", numHashes = 16, numBands = 16,
      minEst = 0.3)
    val bench = Seq((900L, benchText)).toDF("doc_id", "text")
    val batch = Seq(
      (11L, s"$a iota"),                       // near-dup of stored 2
      (13L, benchText),                        // verbatim eval leak
      (15L, s"$a $benchText"),                 // dup of 2 AND leaked
      (17L, "brand new unrelated words entirely fresh"))
      .toDF("doc_id", "text")
    val d = CurationStore.screenDecontaminated(spark, st, batch,
        "text", bench, k = 3, minOverlap = 2, numBands = 16,
        minEst = 0.3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(11L -> "hist_dup", 13L -> "contaminated",
      15L -> "contaminated", 17L -> "kept"), s"decisions: $d")
    // precedence is real: without the benchmark, 15 is a hist_dup
    val plain = CurationStore.screen(spark, st, batch, "text",
        numBands = 16, minEst = 0.3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(plain(15L) == "hist_dup" && plain(13L) == "kept",
      s"fixture assumption broken: $plain")
  }

  test("screenDecontaminatedAttributed: contaminated rows carry NO " +
      "dup_of (the rejection names the benchmark), dedup rows keep " +
      "their winner, dropping dup_of recovers screenDecontaminated") {
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val benchText = "secret eval question one two three four five"
    val st = CurationStore.build(
      Seq((2L, a), (4L, "totally different filler content going here"))
        .toDF("doc_id", "text"),
      "doc_id", "text", s"$tmp-decattr", numHashes = 16, numBands = 16,
      minEst = 0.3)
    val bench = Seq((900L, benchText)).toDF("doc_id", "text")
    val batch = Seq(
      (11L, s"$a iota"),                       // near-dup of stored 2
      (13L, benchText),                        // verbatim eval leak
      (15L, s"$a $benchText"),                 // dup of 2 AND leaked
      (17L, "brand new unrelated words entirely fresh"))
      .toDF("doc_id", "text")
    val attributed = CurationStore.screenDecontaminatedAttributed(
        spark, st, batch, "text", bench, k = 3, minOverlap = 2,
        numBands = 16, minEst = 0.3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(attributed == Map(
      11L -> (("hist_dup", Some(2L))),
      13L -> (("contaminated", None)),
      15L -> (("contaminated", None)),
      17L -> (("kept", None))), s"attributed decisions: $attributed")
    val plain = CurationStore.screenDecontaminated(spark, st, batch,
        "text", bench, k = 3, minOverlap = 2, numBands = 16,
        minEst = 0.3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(attributed.view.mapValues(_._1).toMap == plain,
      "projection away from dup_of drifted from screenDecontaminated")
  }

  test("screen defaults to the store's PERSISTED dials: a store " +
      "built with non-default banding screens under its own " +
      "criteria, a pre-dials layout fails loudly without explicit " +
      "arguments and still works with them") {
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val st = CurationStore.build(
      Seq((2L, a), (4L, "totally different filler content going here"))
        .toDF("doc_id", "text"),
      "doc_id", "text", s"$tmp-dials", numHashes = 16, numBands = 16,
      minEst = 0.3)
    assert(CurationStore.storedDials(spark, st) == ((16, 16, 0.3)),
      "persisted dials do not round-trip")
    val batch = Seq((11L, s"$a iota"), (17L, "fresh words entirely"))
      .toDF("doc_id", "text")
    def decided(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // no banding arguments → the store's own 16/0.3, NOT 4/0.5
    assert(decided(CurationStore.screen(spark, st, batch, "text")) ==
      decided(CurationStore.screen(spark, st, batch, "text",
        numBands = 16, minEst = 0.3)),
      "default screen drifted from the store's persisted dials")
    assert(decided(CurationStore.screen(spark, st, batch, "text"))
        (11L) == "hist_dup",
      "fixture near-dup not caught under the stored dials")
    // fabricate a pre-dials layout: drop the dials line from the
    // manifest (older stores never committed one)
    val fs = new org.apache.hadoop.fs.Path(st.dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val mp = graft.ops.StoreVersions.manifestPath(st.dir)
    val body = {
      val in = fs.open(mp)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val legacy = body.split("\n").filterNot(_.startsWith("dials\t"))
      .mkString("", "\n", "\n")
    val out = fs.create(mp, true)
    try out.write(legacy.getBytes("UTF-8")) finally out.close()
    val e = intercept[IllegalStateException] {
      CurationStore.screen(spark, st, batch, "text").collect()
    }
    assert(e.getMessage.contains("dials"),
      s"pre-dials failure names the wrong cause: ${e.getMessage}")
    // explicit arguments never need the dials stage
    assert(decided(CurationStore.screen(spark, st, batch, "text",
      numBands = 16, minEst = 0.3))(11L) == "hist_dup")
  }

  test("screen: tombstones un-block re-admission, and a replayed " +
      "screen after the fold reproduces its own decisions") {
    import spark.implicits._
    // near is a (J≈0.86) near-dup of a; 16 one-row bands make the
    // collision certain at these deterministic md5 signatures
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val near = s"$a iota"
    val st = CurationStore.build(
      Seq((2L, a), (4L, "totally different filler content going here"))
        .toDF("doc_id", "text"),
      "doc_id", "text", s"$tmp-screen2", numHashes = 16, numBands = 16,
      minEst = 0.3)
    val batch = Seq((11L, near),
      (13L, "brand new unrelated words entirely fresh"))
      .toDF("doc_id", "text")
    def decide() = CurationStore.screen(spark, st, batch, "text",
        numBands = 16, minEst = 0.3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // pre-delete: 11 matches stored 2, 13 is new
    val d0 = decide()
    assert(d0 == Map(11L -> "hist_dup", 13L -> "kept"), s"pre: $d0")
    // take 2 down: its content may return — 11 now screens as kept
    // (the signature read is tomb-masked)
    CurationStore.delete(st, Seq(2L).toDF("doc_id"))
    val d1 = decide()
    assert(d1 == Map(11L -> "kept", 13L -> "kept"), s"post-delete: $d1")
    // fold the batch in, then screen the SAME batch again — the
    // self-exclusion keeps the replayed decisions identical instead
    // of the batch matching itself in history (the crash-replay
    // window CorpusStore.ingestScreened stands on)
    CurationStore.update(st, batch, "text", numHashes = 16,
      numBands = 16, minEst = 0.3)
    val d2 = decide()
    assert(d2 == d1, s"replayed screen drifted: $d2 vs $d1")
  }
}
