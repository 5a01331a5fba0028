package graft.ops

import graft.{PlanFacts, SparkSpec}
import org.apache.spark.sql.functions._

/** The persisted IVFPQ index must be a pure MATERIALIZATION of the
  * in-plan stack (same kernels, frozen to parquet), its serving plan
  * must actually serve (no training, probed-cell pruning), and its
  * incremental fold must be exactly the full re-encode under the
  * stored models — plus the append protocol's crash healing.
  */
class AnnIndexStoreSpec extends SparkSpec {

  private val dials = (col("vec_id") % 50 === 7,
    col("vec_id") % 10 === 3, 2, 32, 2)

  private lazy val emb = sf("embeddings")
  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("ann-index").toString
  private lazy val idx = {
    val (cp, sp, m, sub, it) = dials
    AnnIndexStore.build(emb, "vec_id", "embedding", s"$tmp/full",
      cp, sp, m, sub, it)
  }

  private def queries = emb.filter(col("vec_id") % 100 === 3)
    .select(col("vec_id").as("qid"), col("embedding"))

  private def search(i: AnnIndexStore.Index, q: org.apache.spark.sql.DataFrame =
      queries) = AnnIndexStore.search(spark, i, q, "qid", "embedding", 10)

  private def assertFrameEqual(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, what: String): Unit = {
    assert(a.count() == b.count(), s"$what: row counts differ")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what: symmetric difference is non-empty")
  }

  /** The codes table's scan node in an EXECUTED plan (AQE stages
    * unwrapped). */
  private def codesScan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.execution.FileSourceScanExec = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def nodes(p: SparkPlan): Seq[SparkPlan] = (p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case s: QueryStageExec => s +: nodes(s.plan)
      case o => o +: o.children.flatMap(nodes)
    }) ++ p.subqueries.flatMap(nodes)
    nodes(df.queryExecution.executedPlan).collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("codes")) => s
    }.getOrElse(fail("no codes scan in the serving plan"))
  }

  /** Does the scan carry a static probed-cell IN-list partition
    * filter? (The join's `isnotnull(cell)` pushdown and any runtime
    * DPP subquery don't count — the spec pins the STATIC route.) */
  private def hasStaticCellIn(
      scan: org.apache.spark.sql.execution.FileSourceScanExec): Boolean =
    scan.partitionFilters.exists(_.exists {
      case _: org.apache.spark.sql.catalyst.expressions.In => true
      case _: org.apache.spark.sql.catalyst.expressions.InSet => true
      case _ => false
    })

  test("stored-index search is bit-identical to the in-plan ivfPqTopK") {
    val (cp, sp, m, sub, it) = dials
    assertFrameEqual(search(idx),
      Similarity.ivfPqTopK(emb, "vec_id", "embedding", cp, sp,
        col("vec_id") % 100 === 3, m, sub, it, k = 10),
      "stored vs in-plan")
  }

  test("serving plan: no trainer, probed-cell partition pruning real") {
    val df = search(idx)
    df.collect()
    val f = PlanFacts.of(df)
    // the whole Lloyd/encode machinery is absent: the plan is two
    // shuffles (query-cell argmax, per-query ranking window) over
    // three scans (codes, centroids, query vectors)
    assert(f.shuffles <= 2, s"serving plan shuffles ${f.shuffles} > 2")
    assert(f.scans <= 3, s"serving plan scans ${f.scans} > 3")
    // pruning is a PLAN property (static IN-list partition filter on
    // the codes scan) AND an IO fact: the probed cells are a strict
    // subset, so the scan must touch fewer files than the table holds
    val scan = codesScan(df)
    assert(hasStaticCellIn(scan),
      s"no static probed-cell IN filter on the codes scan " +
        s"(partitionFilters: ${scan.partitionFilters.mkString(", ")})")
    val totalFiles = codesFiles(idx.dir).size
    val read = scan.metrics("numFiles").value
    assert(read < totalFiles,
      s"scan read $read of $totalFiles files — pruning had no effect")
  }

  test("nprobe widens the probe set monotonically: distances only " +
      "improve, partitions read grow but stay pruned") {
    def kth(rows: Array[org.apache.spark.sql.Row]): Map[Long, Double] =
      rows.groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getDouble(2)).max).toMap
    val p1 = AnnIndexStore.search(spark, idx, queries, "qid",
      "embedding", 10, nprobe = 1)
    val p2 = AnnIndexStore.search(spark, idx, queries, "qid",
      "embedding", 10, nprobe = 2)
    val (k1, k2) = (kth(p1.collect()), kth(p2.collect()))
    k2.foreach { case (q, d) =>
      k1.get(q).foreach(d1 => assert(d <= d1,
        s"query $q: nprobe=2 kth distance $d worse than nprobe=1 $d1"))
    }
    val (f1, f2) = (codesScan(p1).metrics("numFiles").value,
      codesScan(p2).metrics("numFiles").value)
    assert(f2 >= f1, "nprobe=2 read fewer partitions than nprobe=1")
    assert(hasStaticCellIn(codesScan(p2)),
      "nprobe=2 lost the static probe-list partition filter")
  }

  test("past the PruneMaxCells ceiling the scan degrades, results hold") {
    val pruned = search(idx).collect().toSeq
    spark.conf.set(AnnIndexStore.PruneMaxCells, "0")
    try {
      val df = search(idx)
      assert(df.collect().toSeq == pruned,
        "unpruned fallback changed results")
      assert(!hasStaticCellIn(codesScan(df)),
        "ceiling 0 should have dropped the static cell IN filter")
    } finally spark.conf.unset(AnnIndexStore.PruneMaxCells)
  }

  test("add() == full re-encode under the stored models; new vectors " +
      "serve") {
    val (cp, sp, m, sub, it) = dials
    val old = emb.filter(col("vec_id") % 5 =!= 4)
    val batch = emb.filter(col("vec_id") % 5 === 4)
    val inc = AnnIndexStore.build(old, "vec_id", "embedding",
      s"$tmp/inc", cp, sp, m, sub, it)
    AnnIndexStore.add(inc, batch, "embedding")
    // expected codes: EVERY vector encoded/assigned under the models
    // the build froze (trained on `old` only) — the shared kernels
    // compose it directly
    val cb = Similarity.pqTrain(old, "vec_id", "embedding", sp, m, sub, it)
    val cents = inc.centroids(spark)
    val expected = Similarity.pqEncode(emb, "vec_id", "embedding",
        cb, m, sub)
      .join(Similarity.assignCosineCells(emb, "vec_id", "embedding",
        cents).select(col("vec_id"), col("cell")), "vec_id")
    assertFrameEqual(
      inc.codes(spark).withColumn("cell", col("cell").cast("long")),
      expected, "incremental codes")
    // a query batch drawn from the NEW vectors answers from the index
    val newQ = emb.filter(col("vec_id") % 100 === 4)
      .select(col("vec_id").as("qid"), col("embedding"))
    assert(search(inc, newQ).count() > 0, "new vectors not servable")
  }

  /** Data files of the CURRENT codes version (manifest-resolved —
    * retained prior versions are the isolation layer, not the
    * serving layout). */
  private def codesFiles(dir: String): Set[String] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val p = new org.apache.hadoop.fs.Path(
      StoreVersions.resolve(fs, dir, "codes"))
    val it = fs.listFiles(p, true)
    val out = scala.collection.mutable.Set.empty[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet"))
        out += f.getPath.toString
    }
    out.toSet
  }

  test("compact folds per-add files to one per cell; rows, search " +
      "unchanged; a crashed compact's leftovers heal") {
    val (cp, sp, m, sub, it) = dials
    val old = emb.filter(col("vec_id") % 5 =!= 4)
    val st = AnnIndexStore.build(old, "vec_id", "embedding",
      s"$tmp/cpt", cp, sp, m, sub, it)
    AnnIndexStore.add(st,
      emb.filter(col("vec_id") % 5 === 4 && col("vec_id") < 250),
      "embedding")
    AnnIndexStore.add(st,
      emb.filter(col("vec_id") % 5 === 4 && col("vec_id") >= 250),
      "embedding")
    val cells = st.codes(spark).select("cell").distinct().count()
    val before = st.codes(spark).collect().map(_.toString).sorted.toSeq
    val served = AnnIndexStore.search(spark, st, queries, "qid",
      "embedding", 10).collect().map(_.toString).sorted.toSeq
    assert(codesFiles(st.dir).size > cells,
      "adds should have left more files than cells")
    // fabricate a crashed compact: a partial UNFLIPPED version dir
    // (flip-last — the manifest never saw it) and the `.swap` marker
    // it died holding
    val fs = new org.apache.hadoop.fs.Path(st.dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val orphan = new org.apache.hadoop.fs.Path(
      s"${st.dir}/codes/v-99999/cell=7")
    fs.mkdirs(orphan)
    val o = fs.create(new org.apache.hadoop.fs.Path(orphan,
      "part-0-dead.snappy.parquet"), true)
    o.write(Array[Byte](9)); o.close()
    UpdateMarker.write(fs, UpdateMarker.markerPath(st.dir),
      UpdateMarker.State("", Map("codes.swap" -> codesFiles(st.dir))))
    AnnIndexStore.compact(spark, st)
    assert(!fs.exists(orphan.getParent),
      "crashed compact's orphan version dir survived the sweep")
    assert(codesFiles(st.dir).size == cells,
      s"compact should leave one file per cell " +
        s"(${codesFiles(st.dir).size} vs $cells)")
    assert(st.codes(spark).collect().map(_.toString).sorted.toSeq
      == before, "compact changed the codes rows")
    assert(AnnIndexStore.search(spark, st, queries, "qid",
        "embedding", 10).collect().map(_.toString).sorted.toSeq
      == served, "compact changed search results")
  }

  test("a compact that died AFTER its commit but before its marker " +
      "delete loses nothing: the .swap marker is never healed by " +
      "file deletion") {
    val (cp, sp, m, sub, it) = dials
    val st = AnnIndexStore.build(emb.filter(col("vec_id") % 5 =!= 4),
      "vec_id", "embedding", s"$tmp/postswap", cp, sp, m, sub, it)
    AnnIndexStore.add(st, emb.filter(col("vec_id") % 5 === 4),
      "embedding")
    val preCompact = codesFiles(st.dir)
    AnnIndexStore.compact(spark, st)
    val rows = st.codes(spark).collect().map(_.toString).sorted.toSeq
    // fabricate the window: the compact committed (codes now holds
    // only the rewritten files) but its marker — snapshotting the
    // PRE-compact listing — survived the crash
    val fs = new org.apache.hadoop.fs.Path(st.dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    UpdateMarker.write(fs, UpdateMarker.markerPath(st.dir),
      UpdateMarker.State("", Map("codes.swap" -> preCompact)))
    // the next writer settles it WITHOUT deleting the (all-new)
    // compacted files — the naive listing-diff heal would wipe the
    // entire stage here
    AnnIndexStore.add(st, emb.filter(col("vec_id") % 100 === 99),
      "embedding")
    assert(!fs.exists(UpdateMarker.markerPath(st.dir)))
    val after = st.codes(spark).collect().map(_.toString).sorted.toSeq
    assert(rows.forall(after.contains),
      "settlement deleted committed compacted files")
  }

  test("compact's manifest flip commits the rewritten codes AND the " +
      "tombstone clear ATOMICALLY: a pre-flip crash leaves the old " +
      "snapshot fully intact, and after any completed compact the " +
      "deleted ids are immediately re-addable — no window where " +
      "cleared tombstones meet old codes or vice versa") {
    val (cp, sp, m, sub, it) = dials
    val doomedPred = col("vec_id") % 100 === 42
    val st = AnnIndexStore.build(emb, "vec_id", "embedding",
      s"$tmp/flip", cp, sp, m, sub, it)
    val fs = new org.apache.hadoop.fs.Path(st.dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    AnnIndexStore.delete(st, emb.filter(doomedPred).select("vec_id"))
    val preManifest = StoreVersions.read(fs, st.dir)
    val masked = st.codes(spark).count()
    // replay compact's steps up to the crash point: marker written,
    // BOTH new version dirs fully staged — then die BEFORE the flip
    UpdateMarker.write(fs, UpdateMarker.markerPath(st.dir),
      UpdateMarker.State("", Map("codes.swap" -> codesFiles(st.dir))))
    st.codes(spark).repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(StoreVersions.next(fs, st.dir, "codes"))
    StoreVersions.nextEmpty(fs, st.dir, "tombstones")
    // crash here: the manifest never moved, so readers and the next
    // writer still see the OLD snapshot — tombstones still masking,
    // re-add still (correctly) guarded
    assert(StoreVersions.read(fs, st.dir) == preManifest,
      "staging moved the manifest before the flip")
    val e = intercept[IllegalArgumentException] {
      AnnIndexStore.add(st, emb.filter(doomedPred), "embedding")
    }
    assert(e.getMessage.contains("tombstoned"))
    assert(st.codes(spark).count() == masked,
      "pre-flip crash changed the served corpus")
    // the interrupted compact's staged versions were swept at the
    // add's entry; a REAL compact then commits codes + cleared
    // tombstones in one flip and the ids are free immediately
    AnnIndexStore.compact(spark, st)
    assert(st.tombstonesIfAny(spark).isEmpty,
      "tombstones survived the committed flip")
    val reAdd = emb.filter(doomedPred)
    AnnIndexStore.add(st, reAdd, "embedding")
    assert(st.codes(spark).filter(doomedPred).count() == reAdd.count(),
      "re-added ids are not live after the atomic clear")
  }

  test("build() settles the directory's previous life: a stale add " +
      "marker cannot wipe a fresh rebuild") {
    val (cp, sp, m, sub, it) = dials
    val dir = s"$tmp/rebuild"
    val st = AnnIndexStore.build(emb.filter(col("vec_id") % 5 =!= 4),
      "vec_id", "embedding", dir, cp, sp, m, sub, it)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // a crashed add's marker from the directory's previous life,
    // snapshotting a listing that shares nothing with a rebuild
    UpdateMarker.write(fs, UpdateMarker.markerPath(dir),
      UpdateMarker.State("", Map("codes" -> Set.empty[String])))
    val st2 = AnnIndexStore.build(emb, "vec_id", "embedding", dir,
      cp, sp, m, sub, it)
    assert(!fs.exists(UpdateMarker.markerPath(dir)),
      "build left the stale marker in place")
    val n = st2.codes(spark).count()
    // the very next writer must NOT heal the fresh codes away
    AnnIndexStore.add(st2,
      emb.limit(0), "embedding") // empty batch: pure settle entry
    assert(st2.codes(spark).count() == n,
      "a post-rebuild writer healed the fresh codes against the " +
        "stale snapshot")
  }

  test("append crash is healed; a batchId replay is a detected no-op") {
    val (cp, sp, m, sub, it) = dials
    val old = emb.filter(col("vec_id") % 5 =!= 4)
    val batch = emb.filter(col("vec_id") % 5 === 4)
    val st = AnnIndexStore.build(old, "vec_id", "embedding",
      s"$tmp/crash", cp, sp, m, sub, it)
    val fs = new org.apache.hadoop.fs.Path(st.dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val baseCount = st.codes(spark).count()
    // fabricate the crash: a marker snapshotting the pre-append
    // listing survives alongside a partial appended file (inside the
    // CURRENT codes version — appends never leave it)
    val curCodes = new org.apache.hadoop.fs.Path(
      StoreVersions.resolve(fs, st.dir, "codes"))
    val cellDir = fs.listStatus(curCodes)
      .filter(_.isDirectory).head.getPath
    // the marker a real crashed add leaves: every stage snapshotted,
    // commitment judged by the (un-flipped) stats listing
    UpdateMarker.write(fs, UpdateMarker.markerPath(st.dir),
      UpdateMarker.State("", Map("codes" -> codesFiles(st.dir),
        "tombs" -> UpdateMarker.listFiles(fs,
          StoreVersions.resolve(fs, st.dir, "tombstones")),
        "stats" -> UpdateMarker.listFiles(fs,
          StoreVersions.resolve(fs, st.dir, "stats")))))
    val junk = new org.apache.hadoop.fs.Path(cellDir,
      "part-99999-crashed.c000.snappy.parquet")
    val o = fs.create(junk, true); o.write(Array[Byte](1, 2, 3)); o.close()
    // the real add settles the crash (junk deleted — a half-appended
    // parquet would otherwise poison every later scan) and commits
    AnnIndexStore.add(st, batch, "embedding", batchId = Some("b1"))
    assert(!fs.exists(junk), "crashed partial file survived settle")
    val afterFirst = st.codes(spark).count()
    assert(afterFirst == baseCount + batch.count(),
      "append missing or doubled after heal")
    // replaying the SAME batch id must not double-append
    AnnIndexStore.add(st, batch, "embedding", batchId = Some("b1"))
    assert(st.codes(spark).count() == afterFirst,
      "batchId replay re-appended rows")
  }

  test("exact live-row counter: liveCount == codes count through " +
      "build/add/delete/compact, a healed crash, and a batchId " +
      "replay — membership probes are one-row metadata reads") {
    val (cp, sp, m, sub, it) = dials
    val old = emb.filter(col("vec_id") % 5 =!= 4)
    val batch = emb.filter(col("vec_id") % 5 === 4)
    val st = AnnIndexStore.build(old, "vec_id", "embedding",
      s"$tmp/counter", cp, sp, m, sub, it)
    def probe(): Long = AnnIndexStore.liveCount(spark, st)
    def truth(): Long = st.codes(spark).count()
    assert(probe() == truth(), "counter wrong after build")
    AnnIndexStore.add(st, batch, "embedding", batchId = Some("c1"))
    assert(probe() == truth(), "counter wrong after add")
    // a crashed add (marker + partial file, stats un-flipped) heals
    // to a no-op: the counter must stay consistent with the healed
    // codes stage
    val fs = new org.apache.hadoop.fs.Path(st.dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val curCodes = new org.apache.hadoop.fs.Path(
      StoreVersions.resolve(fs, st.dir, "codes"))
    val cellDir = fs.listStatus(curCodes)
      .filter(_.isDirectory).head.getPath
    UpdateMarker.write(fs, UpdateMarker.markerPath(st.dir),
      UpdateMarker.State("", Map("codes" -> codesFiles(st.dir),
        "tombs" -> UpdateMarker.listFiles(fs,
          StoreVersions.resolve(fs, st.dir, "tombstones")),
        "stats" -> UpdateMarker.listFiles(fs,
          StoreVersions.resolve(fs, st.dir, "stats")))))
    val junk = new org.apache.hadoop.fs.Path(cellDir,
      "part-99998-crashed.c000.snappy.parquet")
    val o = fs.create(junk, true); o.write(Array[Byte](9)); o.close()
    val doomed = emb.filter(col("vec_id") % 7 === 2).select("vec_id")
    AnnIndexStore.delete(st, doomed, batchId = Some("c2"))
    assert(!fs.exists(junk), "crashed partial file survived settle")
    assert(probe() == truth(), "counter wrong after heal + delete")
    // replays fold the counter exactly once
    AnnIndexStore.delete(st, doomed, batchId = Some("c2"))
    assert(probe() == truth(), "counter drifted on delete replay")
    // ids already tombstoned (keyless re-run) decrement nothing
    AnnIndexStore.delete(st, doomed)
    assert(probe() == truth(), "re-deleting tombstoned ids drifted")
    AnnIndexStore.compact(spark, st)
    assert(probe() == truth(), "counter wrong after compact")
    assert(probe() ==
      old.count() + batch.count() - doomed.distinct().count(),
      "counter does not match the arithmetic truth")
  }

  test("refine dominates plain ADC recall per query at the same " +
      "nprobe, and equals the exact ranking of the shortlist") {
    val k = 10
    val approx = search(idx).select(col("qid"), col("vec_id"))
    val refined = AnnIndexStore.searchRefined(spark, idx, emb,
      queries, "qid", "embedding", k, nprobe = 1, shortlist = 50)
    // exact truth: brute-force squared-euclidean top-k per query
    val base = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("_e"))
    val q = queries.select(col("qid"),
      col("embedding").cast("array<double>").as("_q"))
    val d = round(Similarity.dot(col("_q"), col("_q")) -
      lit(2.0) * Similarity.dot(col("_q"), col("_e")) +
      Similarity.dot(col("_e"), col("_e")), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("_d").asc, col("vec_id").asc)
    val exact = base.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("_d", d).withColumn("_rn",
        org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("_rn") <= k).select("qid", "vec_id")
    def hitsOf(res: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      exact.join(res.select("qid", "vec_id"), Seq("qid", "vec_id"),
          "left_semi")
        .groupBy("qid").agg(count(lit(1)).as("h"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ha = hitsOf(approx)
    val hr = hitsOf(refined)
    val qids = queries.select("qid").collect().map(_.getLong(0))
    for (qid <- qids)
      assert(hr.getOrElse(qid, 0L) >= ha.getOrElse(qid, 0L),
        s"refine lost recall on query $qid: " +
          s"${hr.getOrElse(qid, 0L)} < ${ha.getOrElse(qid, 0L)}")
    assert(hr.values.sum >= ha.values.sum)
    // structural identity: refined top-k == exact ranking of the
    // ADC shortlist (so every recall gain comes from the re-rank,
    // not from extra candidates)
    val sl = AnnIndexStore.search(spark, idx, queries, "qid",
      "embedding", k = 50).select("qid", "vec_id")
    val wSl = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("_d").asc, col("vec_id").asc)
    val exactOfShortlist = base.join(sl, "vec_id")
      .join(broadcast(q), "qid")
      .withColumn("_d", d).withColumn("_rn",
        org.apache.spark.sql.functions.row_number().over(wSl))
      .filter(col("_rn") <= k).select("qid", "vec_id")
    assertFrameEqual(refined.select("qid", "vec_id"), exactOfShortlist,
      "refined vs exact-of-shortlist")
  }

  test("recallProbe measures staleness: adds from a shifted " +
      "distribution drag recall down, a rebuild restores it, and " +
      "the rebuild starts a FRESH log (old-corpus probes would " +
      "pollute the staleness history)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // CLUSTERED corpus (10 near-identical members per cluster): a
    // query's true neighbors are its cluster-mates, so a WELL-FIT
    // index routes them into one cell and recall is high — which is
    // what makes the stale index's collapse measurable
    def vecs(ids: Range, offset: Double) = {
      val centers = ids.map(_ / 10).distinct
        .map(c => c -> Array.fill(64)(rnd.nextDouble() + offset)).toMap
      ids.map(i => (i.toLong, centers(i / 10)
          .map(v => (v + rnd.nextDouble() * 0.01).toFloat)))
        .toDF("vec_id", "embedding")
    }
    val baseCorpus = vecs(0 until 400, 0.0)
    val shifted = vecs(1000 until 1200, 5.0)
    val all = baseCorpus.unionByName(shifted)
    val dir = s"$tmp/drift"
    val (cp, sp, m, sub, it) = dials
    val st = AnnIndexStore.build(baseCorpus, "vec_id", "embedding",
      dir, cp, sp, m, sub, it)
    AnnIndexStore.add(st, shifted, "embedding")
    // probe with queries drawn from the DRIFTED region against the
    // CURRENT corpus: frozen models route and price them badly
    val probeQ = shifted.filter(col("vec_id") % 10 === 1)
      .select(col("vec_id").as("qid"), col("embedding"))
    val stale = AnnIndexStore.recallProbe(spark, st, all, probeQ,
      "qid", "embedding", k = 10, snapshot = "after-drift-add")
      .collect().head
    val staleRecall = stale.getDouble(2)
    // re-train over the current corpus (same id-based dials — the
    // shifted slice now funds centroids and seeds) and re-probe
    val rebuilt = AnnIndexStore.build(all, "vec_id", "embedding",
      dir, cp, sp, m, sub, it)
    val restored = AnnIndexStore.recallProbe(spark, rebuilt, all,
      probeQ, "qid", "embedding", k = 10, snapshot = "after-rebuild")
      .collect().head
    val restoredRecall = restored.getDouble(2)
    assert(staleRecall < restoredRecall,
      s"drift did not show: stale=$staleRecall restored=$restoredRecall")
    assert(restoredRecall - staleRecall >= 0.2,
      s"drift signal too weak to act on: stale=$staleRecall " +
        s"restored=$restoredRecall")
    // a rebuild resets the store wholesale, the log included: its
    // rows probed the PREVIOUS life's corpus/models, and surviving
    // they would skew the trend the operational loop reads — the new
    // life's history starts at the post-rebuild snapshot only
    val log = AnnIndexStore.recallLog(spark, rebuilt)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(log.keySet == Set("after-rebuild"),
      "recall_log survived the rebuild (stale-corpus probes pollute " +
        "the staleness history)")
  }

  test("searchFilteredRefined: every result is allowed; with " +
      "allowed = everything it IS searchRefined; the rows are the " +
      "exact re-rank of the filtered shortlist") {
    val allowed = emb.filter(col("vec_id") % 3 === 0)
      .select("vec_id")
    val fr = AnnIndexStore.searchFilteredRefined(spark, idx, emb,
      allowed, queries, "qid", "embedding", k = 10, nprobe = 2,
      shortlist = 50)
    assert(fr.join(allowed, Seq("vec_id"), "left_anti").isEmpty,
      "a disallowed vector leaked through the filtered refine")
    assertFrameEqual(
      AnnIndexStore.searchFilteredRefined(spark, idx, emb,
        emb.select("vec_id"), queries, "qid", "embedding", k = 10,
        nprobe = 2, shortlist = 50),
      AnnIndexStore.searchRefined(spark, idx, emb, queries, "qid",
        "embedding", k = 10, nprobe = 2, shortlist = 50),
      "allow-everything filtered refine vs plain refine")
    // exactness against the independent re-rank of the same
    // filtered shortlist (the refine stage adds nothing but order)
    val sl = AnnIndexStore.searchFiltered(spark, idx, allowed,
        queries, "qid", "embedding", k = 50, nprobe = 2)
      .select("qid", "vec_id")
    val base = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("_e"))
    val q = queries.select(col("qid"),
      col("embedding").cast("array<double>").as("_q"))
    val d = round(Similarity.dot(col("_q"), col("_q")) -
      lit(2.0) * Similarity.dot(col("_q"), col("_e")) +
      Similarity.dot(col("_e"), col("_e")), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("_d").asc, col("vec_id").asc)
    val expected = base.join(sl, "vec_id").join(broadcast(q), "qid")
      .withColumn("_d", d)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= 10).select("qid", "vec_id")
    assertFrameEqual(fr.select("qid", "vec_id"), expected,
      "filtered refine vs exact-of-filtered-shortlist")
  }

  test("recallProbe's refined exact arm: EQUALS the brute arm when " +
      "the reference shortlist covers the whole corpus, UPPER-bounds " +
      "it at production dials (a floor breach on the optimistic arm " +
      "is conclusive), and never cross-joins the corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vecs(ids: Range, offset: Double) = {
      val centers = ids.map(_ / 10).distinct
        .map(c => c -> Array.fill(64)(rnd.nextDouble() + offset)).toMap
      ids.map(i => (i.toLong, centers(i / 10)
          .map(v => (v + rnd.nextDouble() * 0.01).toFloat)))
        .toDF("vec_id", "embedding")
    }
    val baseCorpus = vecs(0 until 400, 0.0)
    val shifted = vecs(1000 until 1200, 5.0)
    val all = baseCorpus.unionByName(shifted)
    val (cp, sp, m, sub, it) = dials
    val st = AnnIndexStore.build(baseCorpus, "vec_id", "embedding",
      s"$tmp/refine-probe", cp, sp, m, sub, it)
    AnnIndexStore.add(st, shifted, "embedding")
    val probeQ = shifted.filter(col("vec_id") % 10 === 1)
      .select(col("vec_id").as("qid"), col("embedding"))
    def probe(refineShortlist: Int = 0, refineNprobe: Int = 0) =
      AnnIndexStore.recallProbe(spark, st, all, probeQ, "qid",
          "embedding", k = 10, refineShortlist = refineShortlist,
          refineNprobe = refineNprobe)
        .collect().head
    val brute = probe()
    // equality law: reference arm probing EVERY cell with a
    // shortlist past the corpus size IS the exact top-k — the probe
    // row must match the brute arm field for field
    val covered = probe(refineShortlist = 700, refineNprobe = 1000)
    assert(covered == brute,
      s"corpus-covering refined arm diverged from brute force: " +
        s"$covered vs $brute")
    // dominance law: at production dials (same nprobe, modest
    // shortlist) the measured arm's ADC top-k is a subset of the
    // reference shortlist, so every true hit survives re-ranking —
    // the optimistic arm reads >= the true recall
    val optimistic = probe(refineShortlist = 50)
    assert(optimistic.getDouble(2) >= brute.getDouble(2),
      s"refined arm read BELOW the brute arm: " +
        s"${optimistic.getDouble(2)} < ${brute.getDouble(2)}")
    // and the fixture keeps the law observable: drift holds the true
    // recall under 1, so the bound has room to act
    assert(brute.getDouble(2) < 1.0,
      "fixture too easy: drifted brute recall is already perfect")
  }

  test("delete masks search immediately; delete-then-compact == " +
      "original codes minus the deleted rows (frozen models); " +
      "re-add guarded until compact; replay a no-op") {
    val (cp, sp, m, sub, it) = dials
    val st = AnnIndexStore.build(emb, "vec_id", "embedding",
      s"$tmp/del", cp, sp, m, sub, it)
    val doomPred = col("vec_id") % 10 === 6
    val doomed = emb.filter(doomPred).select(col("vec_id"))
    val origRows = st.codes(spark).collect().map(_.toString).toSet
    val preServe = search(st).collect().map(_.toString).toSet
    AnnIndexStore.delete(st, doomed, Some("takedown"))
    // every read is masked from the next query on: no deleted id
    // among candidates, and the codes view == original minus doomed
    val res = search(st)
    assert(res.join(doomed, Seq("vec_id"), "left_semi").isEmpty,
      "a deleted vector served as a candidate")
    val maskedRows = st.codes(spark).collect().map(_.toString).toSet
    val doomedIds = doomed.collect().map(_.getLong(0)).toSet
    assert(maskedRows.subsetOf(origRows) &&
      origRows.size - maskedRows.size == doomedIds.size,
      "masked codes view is not original-minus-deleted")
    // deleting again (keyed replay AND keyless re-run) grows nothing
    val tombCount = spark.read.parquet(st.tombDir(spark)).count()
    AnnIndexStore.delete(st, doomed, Some("takedown"))
    AnnIndexStore.delete(st, doomed)
    assert(spark.read.parquet(st.tombDir(spark)).count() == tombCount,
      "re-delete grew the tombstone set")
    // deleting a NEVER-STORED id is a no-op: no tombstone row, and a
    // later add of that id is not blocked behind the re-add guard
    import spark.implicits._
    val phantomId = 999999999L
    AnnIndexStore.delete(st, Seq(phantomId).toDF("vec_id"))
    assert(spark.read.parquet(st.tombDir(spark)).count() == tombCount,
      "a never-stored id grew the tombstone set")
    AnnIndexStore.add(st,
      emb.filter(col("vec_id") % 10 === 1).limit(1)
        .withColumn("vec_id", lit(phantomId)), "embedding")
    assert(st.codes(spark).filter(col("vec_id") === phantomId)
      .count() == 1, "phantom-delete blocked a later add")
    AnnIndexStore.delete(st, Seq(phantomId).toDF("vec_id"))
    // re-adding a tombstoned id fails loudly until compact
    val e = intercept[IllegalArgumentException] {
      AnnIndexStore.add(st, emb.filter(doomPred).limit(3), "embedding")
    }
    assert(e.getMessage.contains("tombstoned"))
    // compact makes the removal physical and clears the tombstones;
    // serving is unchanged by the rewrite
    val served = search(st).collect().map(_.toString).toSet
    AnnIndexStore.compact(spark, st)
    assert(st.tombstonesIfAny(spark).isEmpty, "tombstones survived")
    assert(st.codes(spark).collect().map(_.toString).toSet == maskedRows,
      "physical codes differ from the masked view")
    assert(search(st).collect().map(_.toString).toSet == served,
      "compact changed serving")
    // the ids are free again: re-encode under the SAME stored models
    // restores the original index exactly
    AnnIndexStore.add(st, emb.filter(doomPred), "embedding")
    assert(st.codes(spark).collect().map(_.toString).toSet == origRows,
      "re-add did not restore the original codes")
    assert(search(st).collect().map(_.toString).toSet == preServe,
      "re-add did not restore the original serving")
  }

  test("searchFiltered: pre-filter semantics — allowed-only results, " +
      "degenerate allow == search, tombstones still mask, pruning " +
      "survives the mask") {
    val allowed = emb.filter(col("vec_id") % 3 === 0).select("vec_id")
    val res = AnnIndexStore.searchFiltered(spark, idx, allowed,
      queries, "qid", "embedding", k = 10, nprobe = 2)
    // every served id is allowed, and the ranking is dense per query
    assert(res.join(allowed, Seq("vec_id"), "left_anti").isEmpty,
      "a disallowed vector was served")
    val badRank = res.groupBy("qid").agg(
        max("rank").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n"))
    assert(badRank.isEmpty, "rank is not dense per query")
    // PRE-filter, not post-filter: dropping disallowed ids from the
    // unfiltered top-10 must lose candidates somewhere that the
    // pre-filter backfills from deeper in the probed cells
    val post = AnnIndexStore.search(spark, idx, queries, "qid",
        "embedding", k = 10, nprobe = 2)
      .join(allowed, Seq("vec_id"), "left_semi")
    assert(post.count() < res.count(),
      "fixture too easy: post-filter lost nothing, the pre-filter " +
        "distinction is untested at these dials")
    // the mask is a semi-join ABOVE the pruned scan: the static
    // probed-cell IN-list still binds to the partition column
    assert(hasStaticCellIn(codesScan(res)),
      "allowed-mask broke probed-cell partition pruning")
    // degenerate allow-list (the whole corpus) is exactly search()
    assertFrameEqual(
      AnnIndexStore.searchFiltered(spark, idx, emb.select("vec_id"),
        queries, "qid", "embedding", k = 10, nprobe = 2),
      AnnIndexStore.search(spark, idx, queries, "qid", "embedding",
        k = 10, nprobe = 2),
      "searchFiltered(all ids) vs search")
    // deletion composes: a tombstoned id never serves even if allowed
    val (cp, sp, m, sub, it) = dials
    val st = AnnIndexStore.build(emb, "vec_id", "embedding",
      s"$tmp/fdel", cp, sp, m, sub, it)
    val doomed = res.select("vec_id").distinct().limit(3)
    val doomedIds = doomed.collect().map(_.getLong(0)).toSet
    AnnIndexStore.delete(st, doomed)
    val masked = AnnIndexStore.searchFiltered(spark, st, allowed,
      queries, "qid", "embedding", k = 10, nprobe = 2)
    assert(masked.filter(col("vec_id").isin(doomedIds.toSeq: _*)).isEmpty,
      "a deleted-but-allowed vector served")
  }

  test("searchExcluding: equals searchFiltered with the complement " +
      "allow-list, keeps probed-cell pruning, and scans codes ONCE") {
    val deny = emb.filter(col("vec_id") % 4 === 1).select("vec_id")
    val res = AnnIndexStore.searchExcluding(spark, idx, deny,
      queries, "qid", "embedding", k = 10, nprobe = 2)
    // semantics: exactly the allow-list complement's serve
    val complement = emb.select("vec_id")
      .join(deny, Seq("vec_id"), "left_anti")
    assertFrameEqual(res,
      AnnIndexStore.searchFiltered(spark, idx, complement, queries,
        "qid", "embedding", k = 10, nprobe = 2),
      "searchExcluding vs searchFiltered(complement)")
    assert(res.join(deny, Seq("vec_id"), "left_semi").isEmpty,
      "a denied vector was served")
    // the mask is an anti-join ABOVE the pruned scan: static
    // probed-cell pruning still binds, and — the point of the deny
    // path — the codes stage is scanned exactly once (the complement
    // formulation pays a second, UNPRUNED scan to materialize
    // corpus-minus-deny)
    assert(hasStaticCellIn(codesScan(res)),
      "deny-mask broke probed-cell partition pruning")
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def nodes(p: SparkPlan): Seq[SparkPlan] = (p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case s: QueryStageExec => s +: nodes(s.plan)
      case o => o +: o.children.flatMap(nodes)
    }) ++ p.subqueries.flatMap(nodes)
    val codesScans = nodes(res.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("codes")) => s
    }
    assert(codesScans.size == 1,
      s"deny path scanned codes ${codesScans.size} times (want 1)")
  }

  test("semanticDups: a stored-identical vector flags at adc 0, a " +
      "far one does not, and the batch never matches ITSELF — even " +
      "after its own vectors were folded (the replay window)") {
    import spark.implicits._
    // the stored corpus carries the dial rows (7 = centroid seed,
    // 3/13 = PQ seeds) plus distinct base vectors
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(j => ((seed * 31 + j * 7) % 13 - 6) / 6f)
    val stored = Seq(3L, 7L, 13L, 20L, 21L, 22L, 23L)
      .map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
    val st = AnnIndexStore.build(stored, "vec_id", "embedding",
      s"$tmp/semdup", col("vec_id") === 7, col("vec_id") % 10 === 3,
      m = 2, subDim = 32, iters = 2)
    // batch: 101 duplicates stored 20 exactly; 102 and 103 duplicate
    // EACH OTHER but nothing stored; 104 is its own vector
    val batch = Seq((101L, vec(20)), (102L, vec(55)), (103L, vec(55)),
      (104L, vec(77))).toDF("vec_id", "embedding")
    def flags(tau: Double) = AnnIndexStore
      .semanticDups(spark, st, batch, "vec_id", "embedding", tau,
        nprobe = 2)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(3),
        r.getDouble(2))).toMap
    // ADC prices the query against the stored vector's PQ
    // RECONSTRUCTION, so even an identical vector lands at the
    // quantization error, not 0 — the dial's unit (the scaladoc's
    // calibration note). The semantics to pin is SEPARATION: the
    // true duplicate's top-1 adc sits strictly under every
    // non-duplicate's, and a tau between them flags exactly it.
    val probe = flags(tau = Double.MaxValue)
    val dupAdc = probe(101L)._2
    val othersMin = Seq(102L, 103L, 104L).map(probe(_)._2).min
    assert(dupAdc < othersMin,
      s"duplicate not separated: dup adc $dupAdc vs others $probe")
    val tau = (dupAdc + othersMin) / 2
    val f = flags(tau)
    assert(f(101L)._1 && !f(102L)._1 && !f(103L)._1 && !f(104L)._1,
      s"midpoint tau did not flag exactly the duplicate: $f")
    // within-batch twins must owe their non-flag to the batch-id
    // exclusion, not to distance: each IS the other's zero-distance
    // neighbor, so without the exclusion they would flag at any tau
    // ≥ their quantization error ≈ dupAdc
    assert(probe(102L)._2 > dupAdc && probe(103L)._2 > dupAdc,
      s"twins' nearest STORED neighbor should be far: $probe")
    // fold the batch (the crashed-coordinator shape), re-flag: the
    // batch's own folded copies must stay excluded — decisions
    // reproduce exactly
    AnnIndexStore.add(st, batch, "embedding", batchId = Some("sem-b1"))
    assert(flags(tau) == f,
      "replayed semantic flags drifted after the fold")
  }

  test("tauCalibration: on the planted-separation fixture the exact " +
      "arm finds the true duplicate at distance 0, margins equal the " +
      "quantization error, and the flip classes land exactly where " +
      "tau sits relative to the two boundaries") {
    import spark.implicits._
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(j => ((seed * 31 + j * 7) % 13 - 6) / 6f)
    val stored = Seq(3L, 7L, 13L, 20L, 21L, 22L, 23L)
      .map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
    val st = AnnIndexStore.build(stored, "vec_id", "embedding",
      s"$tmp/taucal", col("vec_id") === 7, col("vec_id") % 10 === 3,
      m = 2, subDim = 32, iters = 2)
    // 101 duplicates stored 21 exactly (vec() is periodic mod 13 in
    // its seed, so 20 ≡ 7 — 21 is the unique-vector choice); 104 is
    // far from everything
    val qs = Seq((101L, vec(21)), (104L, vec(77)))
      .toDF("vec_id", "embedding")
    def calib(tau: Double) = AnnIndexStore
      .tauCalibration(spark, st, stored, qs, "vec_id", "embedding",
        tau, nprobe = 2)
      .collect().map(r => r.getAs[Long]("qid") -> r).toMap
    val probe = calib(Double.MaxValue)
    // exact arm: the duplicate's true nearest is stored 20 at 0 —
    // so its margin IS the PQ quantization error (= its adc)
    val dup = probe(101L)
    assert(dup.getAs[Long]("exact_id") == 21L &&
      dup.getAs[Double]("exact_dist") == 0.0,
      s"exact arm missed the planted duplicate: $dup")
    assert(dup.getAs[Double]("margin") == dup.getAs[Double]("adc"),
      s"margin != adc - 0 on the duplicate: $dup")
    val far = probe(104L)
    assert(far.getAs[Double]("exact_dist") > 0.0, s"104 not far: $far")
    // tau between the dup's quantization error and the far query's
    // exact distance: both arms agree on both queries
    val dupAdc = dup.getAs[Double]("adc")
    val mid = (math.max(dupAdc, 0.0) +
      math.min(far.getAs[Double]("exact_dist"),
        far.getAs[Double]("adc"))) / 2
    val agree = calib(mid)
    assert(agree(101L).getAs[String]("flip") == "agree" &&
      agree(101L).getAs[Boolean]("adc_flag") &&
      agree(101L).getAs[Boolean]("exact_flag"), s"mid tau: $agree")
    assert(agree(104L).getAs[String]("flip") == "agree" &&
      !agree(104L).getAs[Boolean]("adc_flag") &&
      !agree(104L).getAs[Boolean]("exact_flag"), s"mid tau: $agree")
    // tau BELOW the duplicate's quantization error but at/above its
    // exact distance (0): the ADC arm refuses to flag what the exact
    // gate would — the false_admit direction, pinned
    val low = calib(dupAdc / 2)
    assert(low(101L).getAs[String]("flip") == "false_admit",
      s"low tau should expose the dup-leak direction: $low")
    // CANDIDATE-LESS queries must SURFACE, not vanish (the frame is
    // keyed by the exact arm): delete every stored vector — the ADC
    // arm's probed cells are all masked empty, so each query row
    // carries a NULL adc arm, adc_flag false (the gate's actual
    // behavior: semanticDups only flags found candidates), and a
    // query under tau on the exact arm reads false_admit — the
    // dup-leak the empty probe budget caused
    AnnIndexStore.delete(st, stored.select("vec_id"),
      batchId = Some("taucal-wipe"))
    val wiped = AnnIndexStore.tauCalibration(spark, st, stored, qs,
        "vec_id", "embedding", mid, nprobe = 2)
      .collect().map(r => r.getAs[Long]("qid") -> r).toMap
    assert(wiped.keySet == Set(101L, 104L),
      s"candidate-less queries vanished from the calibration: " +
        s"${wiped.keySet}")
    assert(wiped(101L).isNullAt(wiped(101L).fieldIndex("adc")) &&
      wiped(101L).isNullAt(wiped(101L).fieldIndex("nn_id")),
      s"a candidate-less query should carry a NULL adc arm: $wiped")
    assert(!wiped(101L).getAs[Boolean]("adc_flag") &&
      wiped(101L).getAs[String]("flip") == "false_admit",
      s"the empty-probe dup leak did not surface as false_admit: " +
        s"${wiped(101L)}")
  }
}
