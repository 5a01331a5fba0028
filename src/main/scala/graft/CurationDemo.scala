package graft

import graft.ops.{Dedup, Sampling, StatsStore, TextOps}
import org.apache.spark.sql.functions._

/** Offline end-to-end drive of the TRAINING-DATA CURATION story —
  * the analytics-side sibling of `graft.ark.Demo`: one lazy pipeline
  * per stage, every stage an operator the oracle battery already
  * hash-checks individually (q117 → q43 → q121 → q119 → q120, then
  * the q127/q129 monitoring arc, the q125/q126 serving-layout arc
  * with its delta-update + compaction loop, and the q148/q150
  * retrieval-serving arc over the persisted ANN index), with the
  * cross-stage invariants asserted here because they only exist in
  * composition.
  * Run:
  *
  *   sbt -batch "runMain graft.CurationDemo [sfDir]"
  *
  * Greppable markers: `[curate]`.
  */
object CurationDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    def log(s: String): Unit = println(s"[curate] $s")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    log(s"corpus: ${docs.count()} docs from $dir")

    // 1. model-score every doc (hashed linear classifier, q117)
    val scored = TextOps.qualityClassify(docs, "doc_id", "text", 4096)
      .select(col("doc_id"), col("prob"))
    log(f"scored: mean quality ${scored.agg(avg("prob")).head().getDouble(0)}%.4f")

    // 2. near-dup candidates (minhash LSH estimate tier, q43's dial)
    val pairs = Dedup.minhashEstimatePairs(docs, "doc_id", "text",
        numHashes = 16, numBands = 4)
      .filter(col("est_jaccard") >= 0.5)
      .persist()
    log(s"near-dup pairs over the 0.5 estimate cut: ${pairs.count()}")

    // 3. quality-aware canonical selection (q121): keep the BEST
    //    cluster member, not the min id
    val decisions = Dedup.dedupCorpusBest(scored, "doc_id", pairs, "prob")
    val kept = decisions.filter(col("kept"))
    val perCluster = decisions.groupBy("cluster")
      .agg(sum(when(col("kept"), 1).otherwise(0)).as("k"))
      .filter(col("k") =!= 1).count()
    require(perCluster == 0, s"$perCluster clusters without exactly one canonical")
    log(s"dedup: kept ${kept.count()} canonical docs (exactly one per cluster)")

    // 4. leakage-free split (q119): the split key is the CLUSTER
    val keyed = decisions.select(col("doc_id"),
      col("cluster").as("skey"))
    val sp = Sampling.split(keyed, "skey", valPct = 1, testPct = 1)
    val leaked = pairs
      .join(sp.select(col("doc_id").as("a"), col("split").as("_sa")), "a")
      .join(sp.select(col("doc_id").as("b"), col("split").as("_sb")), "b")
      .filter(col("_sa") =!= col("_sb")).count()
    require(leaked == 0, s"$leaked near-dup pairs straddle the split")
    val splitCounts = sp.groupBy("split").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
    log(s"split by cluster key: $splitCounts, leaked pairs: $leaked")

    // 5. quality-weighted sample of the kept TRAIN docs (q120). The
    //    classifier's probs sit in a narrow band (~0.27–0.73), so the
    //    sampling weight is the SHARPENED score prob^8 — the
    //    temperature dial a curation run turns to make quality
    //    actually move inclusion odds (best/worst odds ratio ~2800:1
    //    instead of ~2.7:1).
    val trainKept = kept.join(
        sp.filter(col("split") === "train").select("doc_id"), "doc_id")
      .withColumn("w", round(pow(col("prob"), 8), 6))
    val n = trainKept.count()
    val k = math.max(1, (n / 5).toInt)
    val sample = Sampling.weightedSample(
      trainKept.select(col("doc_id"), col("prob"), col("w")),
      "doc_id", "w", k)
    val sampleRows = sample.collect()
    require(sampleRows.length == math.min(k, n.toInt), "sample size")
    val meanAll = trainKept.agg(avg("prob")).head().getDouble(0)
    val meanSample = sampleRows.map(_.getDouble(1)).sum / sampleRows.length
    require(meanSample > meanAll,
      f"sharpened weighting must raise sample quality: $meanSample%.4f <= $meanAll%.4f")
    log(f"weighted sample (w = prob^8): $k of $n train docs, mean " +
      f"quality $meanSample%.4f vs corpus $meanAll%.4f")

    pairs.unpersist()

    // 6. the monitoring arc (q127/q129): build "yesterday's" stats
    //    store from half the corpus, fold the other half in as a
    //    batch (the q131 streaming loop runs this same update per
    //    micro-batch), and read the drift report a daily ingest pages
    //    on — all from stored sketches, no corpus re-scan
    val storeDir = java.nio.file.Files
      .createTempDirectory("curate-stats").toString
    val oldDir = java.nio.file.Files
      .createTempDirectory("curate-stats-old").toString
    val oldSt = StatsStore.build(
      docs.filter(col("doc_id") % 2 === 0), "text", "source", oldDir)
    val newSt = StatsStore.update(
      StatsStore.build(docs.filter(col("doc_id") % 2 === 0),
        "text", "source", storeDir),
      docs.filter(col("doc_id") % 2 === 1), "text", "source",
      batchId = Some("demo-batch-1"))
    val drift = StatsStore.driftReport(spark, oldSt, newSt)
      .orderBy("source").collect()
    require(drift.nonEmpty, "drift report must cover every source")
    val worst = drift.maxBy(_.getDouble(7))
    log(f"stats drift after the batch: ${drift.length} sources; " +
      f"max novelty ${worst.getDouble(7)}%.4f (${worst.getString(0)})")
    // counters must agree with a from-scratch rebuild (the update law
    // the store's whole maintenance discipline stands on)
    val rebuilt = StatsStore.build(docs, "text", "source",
      java.nio.file.Files.createTempDirectory("curate-stats-rb").toString)
    val updTotals = newSt.stats(spark)
      .agg(sum("docs"), sum("token_occurrences")).head()
    val rbTotals = rebuilt.stats(spark)
      .agg(sum("docs"), sum("token_occurrences")).head()
    require(updTotals == rbTotals,
      s"update law broken: $updTotals vs rebuild $rbTotals")
    log("monitoring: drift read from stored sketches; batch-update " +
      "counters exactly equal a full rebuild")

    // 7. the serving-layout arc (q125/q126 + the compaction path):
    //    build the label store on "yesterday's" half, compact it to
    //    the bucketed serving layout, fold today's batch in as a
    //    DELTA (the base stays immutable), serve a zero-exchange-
    //    shaped label join through labelJoin, then compact the delta
    //    back in — the full maintain-while-serving loop
    val curDir = java.nio.file.Files
      .createTempDirectory("curate-labels").toString
    val plainStore = ops.CurationStore.build(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", curDir)
    val served = ops.CurationStore.compact(spark, plainStore, 8)
    ops.CurationStore.update(served,
      docs.filter(col("doc_id") % 2 === 1), "text",
      batchId = Some("demo-batch-1"))
    val viaJoin = ops.CurationStore.labelJoin(
      docs.select("doc_id"), served).count()
    val viaLabels = served.labels(spark).count()
    require(viaJoin == viaLabels,
      s"labelJoin rows $viaJoin != effective labels $viaLabels")
    val compacted = ops.CurationStore.compact(spark, served, 8)
    require(compacted.labels(spark).count() == viaLabels,
      "compaction must not change the label map")
    log(s"serving layout: bucketed base + $viaLabels labels maintained " +
      "through a delta update and re-compaction, joins base-bucketed")

    // 7b. the admission gate (q186/q191/q192): a RECRAWL arrives —
    //     every odd doc again, under fresh ids — and the store's
    //     stored signatures turn it away at the door: each signable
    //     recrawl doc screens hist_dup WITH the duplicate named
    //     (history wins over within-batch clustering, so re-arriving
    //     near-dup pairs never read as batch_dups); only the
    //     sub-shingle-width docs — which can never LSH-match — pass
    val recrawl = docs.filter(col("doc_id") % 2 === 1)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val gate = ops.CurationStore
      .screenAttributed(spark, compacted, recrawl, "text").collect()
    val nSignable = ops.Dedup.minhashSignatures(
      recrawl, "doc_id", "text", 16).count()
    val nHist = gate.count(_.getString(1) == "hist_dup")
    require(gate.length == recrawl.count() && nHist == nSignable,
      s"recrawl gate: $nHist hist_dups of $nSignable signable " +
        s"(${gate.length} total)")
    require(gate.filter(_.getString(1) == "hist_dup")
        .forall(r => !r.isNullAt(2) && r.getLong(2) < 100000L),
      "a hist_dup's receipt must name a STORED doc")
    log(s"admission gate: recrawl of ${gate.length} docs rejected " +
      s"$nHist as attributed hist_dups; only the " +
      s"${gate.length - nHist} sub-shingle-width docs passed")
    compacted.labelsTable.foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))

    // 8. the retrieval-serving arc (q148/q150/q154 + compact): build
    //    the persisted ANN index on "yesterday's" vectors, serve a
    //    query batch with zero training in-plan, fold today's batch
    //    in with the STORED models, serve queries drawn from the NEW
    //    vectors, then compact — the vector-tier maintain-while-
    //    serving loop
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val idxDir = java.nio.file.Files
      .createTempDirectory("curate-annidx").toString
    val dd = ops.AnnIndexStore.CorpusDials
    val yesterday = emb.filter(col("vec_id") % 5 =!= 4)
    val idx = ops.AnnIndexStore.build(yesterday, "vec_id", "embedding",
      idxDir, dd.centroidPred, dd.seedPred, dd.m, dd.subDim, dd.iters)
    val oldQ = emb.filter(col("vec_id") % 100 === 3)
      .select(col("vec_id").as("qid"), col("embedding"))
    val servedIdx = ops.AnnIndexStore
      .search(spark, idx, oldQ, "qid", "embedding", k = 10)
    val inPlan = ops.Similarity.ivfPqTopK(yesterday, "vec_id",
      "embedding", dd.centroidPred, dd.seedPred,
      col("vec_id") % 100 === 3, dd.m, dd.subDim, dd.iters, k = 10)
    require(servedIdx.exceptAll(inPlan).isEmpty &&
        inPlan.exceptAll(servedIdx).isEmpty,
      "stored-index serving diverged from the in-plan stack")
    // kth-distance monotonicity holds only for queries whose result
    // was FULL before the add: an under-filled cell legitimately
    // gains worse-but-valid tail rows when candidates arrive
    def kthFull(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.groupBy("qid")
        .agg(max("adc").as("m"), count(lit(1)).as("c"))
        .filter(col("c") === 10).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val kthBefore = kthFull(servedIdx)
    ops.AnnIndexStore.add(idx, emb.filter(col("vec_id") % 5 === 4),
      "embedding", batchId = Some("demo-batch-1"))
    val afterAdd = ops.AnnIndexStore
      .search(spark, idx, oldQ, "qid", "embedding", k = 10)
    kthFull(afterAdd).foreach { case (q, d) =>
      kthBefore.get(q).foreach(d0 => require(d <= d0,
        s"adding candidates worsened query $q: $d > $d0")) }
    val newQ = emb.filter(col("vec_id") % 100 === 4)
      .select(col("vec_id").as("qid"), col("embedding"))
    val newServed = ops.AnnIndexStore
      .search(spark, idx, newQ, "qid", "embedding", k = 10).count()
    require(newServed > 0, "new vectors not servable after add")
    val preCompact = afterAdd.collect().map(_.toString).sorted.toSeq
    ops.AnnIndexStore.compact(spark, idx)
    val postCompact = ops.AnnIndexStore
      .search(spark, idx, oldQ, "qid", "embedding", k = 10)
      .collect().map(_.toString).sorted.toSeq
    require(postCompact == preCompact,
      "compaction changed serving results")
    log(s"retrieval serving: index built on ${yesterday.count()} " +
      s"vectors == in-plan stack, batch folded with stored models " +
      s"($newServed results for new-vector queries), compaction " +
      "serving-invariant")
    // the operational loop's last mile: the advisor reads the
    // maintenance signals this very pipeline just produced and says
    // whether action is due — a freshly-compacted index must read
    // all-ok (file listings + one-row reads; no corpus-sized job)
    val advice = ops.Advisor.adviseAnn(spark, idx)
      .select("metric", "action").collect()
      .map(r => s"${r.getString(0)}=${r.getString(1)}")
    require(ops.Advisor.adviseAnn(spark, idx)
        .filter(col("action") =!= "ok").isEmpty,
      "a freshly-compacted index advised maintenance")
    log(s"maintenance advisor on the compacted index: " +
      advice.mkString(", "))
    // 9. the snapshot log closes the loop operationally: pin the
    //    compacted epoch, fold a BAD batch, time-travel-read the
    //    pre-batch state through the pin, then ROLL the batch back —
    //    serving and the exact counter restore together
    val fsIdx = new org.apache.hadoop.fs.Path(idxDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val seqGood = ops.StoreVersions.snapshots(fsIdx, idxDir).last._1
    val nGood = ops.AnnIndexStore.liveCount(spark, idx)
    ops.AnnIndexStore.add(idx,
      emb.filter(col("vec_id") % 50 === 7)
        .withColumn("vec_id", col("vec_id") + 9000000L),
      "embedding", batchId = Some("demo-bad-crawl"))
    require(ops.AnnIndexStore.liveCount(spark, idx) > nGood,
      "fixture: the bad batch should have landed")
    require(idx.pinAt(spark, seqGood).stats(spark).head().getLong(0)
        == nGood,
      "the time-travel pin must see the pre-batch counter")
    ops.AnnIndexStore.rollback(spark, idx, seqGood)
    require(ops.AnnIndexStore.liveCount(spark, idx) == nGood,
      "rollback did not restore the exact counter")
    val postRollback = ops.AnnIndexStore
      .search(spark, idx, oldQ, "qid", "embedding", k = 10)
      .collect().map(_.toString).sorted.toSeq
    require(postRollback == postCompact,
      "rollback did not restore serving exactly")
    log(s"snapshot log: bad batch folded (counter $nGood -> past), " +
      s"pre-batch epoch read through pinAt($seqGood), rollback " +
      "restored serving and the counter exactly")
    // 10. fork the store: clone the good epoch into a fresh root —
    //     an independent store serving identically, whose mutations
    //     never reach the source (the DR/dev-fixture op)
    val forkDir = s"$idxDir-fork"
    fsIdx.delete(new org.apache.hadoop.fs.Path(forkDir), true)
    val seqNow = ops.StoreVersions.snapshots(fsIdx, idxDir).last._1
    val fork = ops.AnnIndexStore.cloneAt(spark, idx, seqNow, forkDir)
    require(ops.AnnIndexStore.liveCount(spark, fork) == nGood,
      "the fork's exact counter != the cloned epoch's")
    val forkServe = ops.AnnIndexStore
      .search(spark, fork, oldQ, "qid", "embedding", k = 10)
      .collect().map(_.toString).sorted.toSeq
    require(forkServe == postRollback,
      "the fork does not serve its epoch verbatim")
    ops.AnnIndexStore.delete(fork,
      emb.filter(col("vec_id") % 9 === 2).select("vec_id"))
    require(ops.AnnIndexStore.liveCount(spark, idx) == nGood,
      "a fork delete reached the source store")
    log(s"store fork: clone of epoch $seqNow serves verbatim " +
      s"($nGood vectors), fork mutations isolated from the source")
    // the index (and its fork) is a full encoded corpus copy — drop
    // both like the sibling stages drop their temp artifacts
    val idxPath = new org.apache.hadoop.fs.Path(idxDir)
    idxPath.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(idxPath, true)
    fsIdx.delete(new org.apache.hadoop.fs.Path(forkDir), true)

    log("OK — every stage is the oracle-checked operator, composed")
    spark.stop()
  }
}
