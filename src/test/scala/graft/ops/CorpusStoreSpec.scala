package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The cross-store transaction layer's contract is CONVERGENCE UNDER
  * REPLAY: a coordinator crash between any two per-store calls leaves
  * a prefix of the stores at the new epoch, and re-issuing the same
  * transaction (same batchId) must no-op where it already applied and
  * apply where it did not — with [[CorpusStore.liveCounts]] equal
  * across the three stores after every COMPLETED transaction, and
  * each store serving exactly what its own maintenance contract says.
  */
class CorpusStoreSpec extends SparkSpec {

  private val terms = Seq("join", "vector", "stream")
  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("corpus-store").toString
  private lazy val corpus = {
    val docs = sf("documents")
    val emb = sf("embeddings")
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(docs("doc_id"), col("text"), col("embedding"))
  }
  private lazy val dials = AnnIndexStore.Dials(
    col("doc_id") % 50 === 7, col("doc_id") % 10 === 3,
    m = 2, subDim = 32, iters = 2)

  private def assertFrameEqual(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, what: String): Unit = {
    assert(a.count() == b.count(), s"$what: row counts differ")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what: symmetric difference is non-empty")
  }

  test("ingest/delete transactions converge under mid-crash replay; " +
      "live counts agree after every completed transaction; each " +
      "store serves its own contract") {
    val base = corpus.filter(col("doc_id") % 5 =!= 4)
    val batch = corpus.filter(col("doc_id") % 5 === 4)
    val st = CorpusStore.build(base, "doc_id", "text", "embedding",
      s"$tmp/cs", annDials = Some(dials))
    val n0 = base.count()
    assert(CorpusStore.liveCounts(spark, st) == ((n0, n0, n0)),
      "stores disagree on membership right after build")

    // fabricate the mid-transaction crash: the FIRST store in the
    // application order already folded the batch, then the
    // coordinator died — the replay must no-op there and apply to
    // the other two
    CurationStore.update(st.curation,
      batch.select(col("doc_id"), col("text")), "text",
      batchId = Some("b1"))
    CorpusStore.ingest(st, batch, "text", "embedding", "b1")
    val n1 = corpus.count()
    assert(CorpusStore.liveCounts(spark, st) == ((n1, n1, n1)),
      "replayed ingest did not converge the three stores")
    // curation applied EXACTLY once: one label set equal to a
    // rebuild's (a double-fold would duplicate signature rows)
    val rebuilt = CurationStore.build(
      corpus.select(col("doc_id"), col("text")), "doc_id", "text",
      s"$tmp/cur-rebuild")
    assertFrameEqual(st.curation.labels(spark), rebuilt.labels(spark),
      "labels after crash-replay ingest vs rebuild")
    // a SECOND full replay is a three-way no-op
    CorpusStore.ingest(st, batch, "text", "embedding", "b1")
    assert(CorpusStore.liveCounts(spark, st) == ((n1, n1, n1)),
      "batchId replay re-applied somewhere")

    // same discipline for the takedown: ann already folded d1
    val doomed = corpus.filter(col("doc_id") % 10 === 6)
      .select("doc_id")
    AnnIndexStore.delete(st.ann, doomed, batchId = Some("d1"))
    CorpusStore.delete(st, doomed, "d1")
    val n2 = corpus.filter(col("doc_id") % 10 =!= 6).count()
    assert(CorpusStore.liveCounts(spark, st) == ((n2, n2, n2)),
      "replayed delete did not converge the three stores")

    // per-store serving contracts through the orchestrator, after
    // the removals become physical
    val stc = CorpusStore.compact(spark, st)
    assert(CorpusStore.liveCounts(spark, stc) == ((n2, n2, n2)),
      "compact changed membership")
    val net = corpus.filter(col("doc_id") % 10 =!= 6)
    // text: collection stats track the net corpus == rebuild
    val textRebuild = TextIndexStore.build(
      net.select(col("doc_id"), col("text")), "doc_id", "text",
      s"$tmp/text-rebuild")
    assertFrameEqual(TextIndexStore.bm25(spark, stc.text, terms),
      TextIndexStore.bm25(spark, textRebuild, terms),
      "text serving vs net-corpus rebuild")
    // curation: compact re-resolved the topology == rebuild
    val curRebuild = CurationStore.build(
      net.select(col("doc_id"), col("text")), "doc_id", "text",
      s"$tmp/cur-net-rebuild")
    assertFrameEqual(stc.curation.labels(spark),
      curRebuild.labels(spark), "curation labels vs net rebuild")
    // ann: models frozen at build — NOT a rebuild; equal to a
    // reference single store maintained by the same sequence
    val ref = AnnIndexStore.build(
      base.select(col("doc_id"), col("embedding")), "doc_id",
      "embedding", s"$tmp/ann-ref", dials.centroidPred,
      dials.seedPred, dials.m, dials.subDim, dials.iters)
    AnnIndexStore.add(ref, batch.select(col("doc_id"), col("embedding")),
      "embedding", batchId = Some("b1"))
    AnnIndexStore.delete(ref, doomed, batchId = Some("d1"))
    val queries = corpus.filter(col("doc_id") % 100 === 3)
      .select(col("doc_id").as("qid"), col("embedding"))
    assertFrameEqual(
      AnnIndexStore.search(spark, stc.ann, queries, "qid",
        "embedding", k = 10),
      AnnIndexStore.search(spark, ref, queries, "qid",
        "embedding", k = 10),
      "ann serving vs identically-maintained reference store")
    // and frozen-models means the ANN rebuild DIFFERS (fixture
    // strength: the distinction the reference comparison relies on)
    val annRebuild = AnnIndexStore.build(
      net.select(col("doc_id"), col("embedding")), "doc_id",
      "embedding", s"$tmp/ann-rebuild", dials.centroidPred,
      dials.seedPred, dials.m, dials.subDim, dials.iters)
    val a = AnnIndexStore.search(spark, stc.ann, queries, "qid",
      "embedding", k = 10)
    val b = AnnIndexStore.search(spark, annRebuild, queries, "qid",
      "embedding", k = 10)
    assert(!(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty),
      "fixture too easy: frozen-model serving equals a net rebuild")
  }

  test("the stats tier is the FOURTH store of the transaction: " +
      "ingest/delete under one batchId with replay no-ops, exact " +
      "counters track serving membership, sketches flip stale on " +
      "delete, and compact re-derives — equal to a from-scratch " +
      "build at each field's guarantee class") {
    val docs = sf("documents")
    val emb = sf("embeddings")
    val corpus4 = docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(docs("doc_id"), col("text"), col("source"),
        col("embedding"))
    val base = corpus4.filter(col("doc_id") % 5 =!= 4)
    val batch = corpus4.filter(col("doc_id") % 5 === 4)
    val st = CorpusStore.build(base, "doc_id", "text", "embedding",
      s"$tmp/cs4", annDials = Some(dials), sourceCol = Some("source"))
    assert(st.stats.isDefined, "sourceCol did not mount the stats tier")
    val n0 = base.count()
    assert(CorpusStore.liveCountsAll(spark, st) ==
      ((n0, n0, n0, Some(n0))),
      "four-way membership disagrees right after build")

    // per-source, per-guarantee-class comparison helper. KLL is
    // asserted EXACTLY equal here because at this fixture scale each
    // source holds far fewer than k = 200 lengths — the sketch
    // retains every value (no randomized compaction has happened),
    // so quantiles are exact on both sides; at larger scale this
    // clause would become the StatsStoreSpec rank-bound instead.
    def readout(x: StatsStore.Store) = x.stats(spark).select(
        col("source"), col("docs"), col("token_occurrences"),
        hll_sketch_estimate(col("tok_hll")).as("_h"),
        theta_sketch_estimate(col("fp_theta")).cast("long").as("_t"),
        kll_sketch_get_quantile_bigint(col("len_kll"), lit(0.5))
          .as("_p50"),
        kll_sketch_get_quantile_bigint(col("len_kll"), lit(0.95))
          .as("_p95"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    def countersOf(x: StatsStore.Store) = x.stats(spark)
      .select("source", "docs", "token_occurrences")
      .collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    // fabricate the mid-transaction crash with the FOURTH store the
    // one that already folded: the replay must no-op there and apply
    // to the serving three
    StatsStore.update(st.stats.get,
      batch.select(col("text"), col("source")), "text", "source",
      batchId = Some("b1"))
    CorpusStore.ingest(st, batch, "text", "embedding", "b1")
    val n1 = corpus4.count()
    assert(CorpusStore.liveCountsAll(spark, st) ==
      ((n1, n1, n1, Some(n1))),
      "replayed ingest did not converge the four stores")
    CorpusStore.ingest(st, batch, "text", "embedding", "b1")
    assert(CorpusStore.liveCountsAll(spark, st) ==
      ((n1, n1, n1, Some(n1))),
      "batchId replay re-applied somewhere (stats double-fold?)")
    // the maintained stats tier == a from-scratch build, field for
    // field (no deletes yet: every class is at full strength)
    val freshFull = StatsStore.build(
      corpus4.select(col("text"), col("source")), "text", "source",
      s"$tmp/stats-fresh-full")
    assert(readout(st.stats.get) == readout(freshFull),
      "maintained stats tier != from-scratch build after ingest")

    // the takedown needs the doomed docs' ROWS for the stats tier —
    // ids alone must fail loudly, not silently skip the counters
    val doomedIds = corpus4.filter(col("doc_id") % 10 === 6)
      .select("doc_id")
    val doomedDocs = corpus4.filter(col("doc_id") % 10 === 6)
    intercept[IllegalArgumentException] {
      CorpusStore.delete(st, doomedIds, "d0")
    }
    CorpusStore.delete(st, doomedIds, "d1", Some(doomedDocs))
    val net = corpus4.filter(col("doc_id") % 10 =!= 6)
    val n2 = net.count()
    assert(CorpusStore.liveCountsAll(spark, st) ==
      ((n2, n2, n2, Some(n2))),
      "exact counters did not track the takedown")
    CorpusStore.delete(st, doomedIds, "d1", Some(doomedDocs))
    assert(CorpusStore.liveCountsAll(spark, st) ==
      ((n2, n2, n2, Some(n2))),
      "delete replay decremented twice")

    // guarantee classes diverge mid-debt: counters EXACTLY equal a
    // net rebuild; exactly the touched sources are flagged stale
    // (their sketches still describe the pre-delete superset)
    val touched = doomedDocs.select("source").distinct()
      .collect().map(_.getString(0)).toSet
    val freshNet = StatsStore.build(
      net.select(col("text"), col("source")), "text", "source",
      s"$tmp/stats-fresh-net")
    // a source the takedown emptied entirely stays as a docs=0 row
    // (the driftReport "gone dark" visibility rule — a rebuild never
    // saw it); every still-live source's counters equal the rebuild
    val (zeroed, live) = countersOf(st.stats.get)
      .partition { case (_, (d, _)) => d == 0L }
    assert(live == countersOf(freshNet),
      "exact counters != net rebuild while sketch debt outstanding")
    assert(zeroed.keySet == touched -- countersOf(freshNet).keySet,
      "zeroed rows are not exactly the sources the takedown emptied")
    assert(zeroed.forall { case (_, (_, t)) => t == 0L },
      "an emptied source kept token_occurrences")
    val flagged = st.stats.get.stats(spark).filter(col("stale"))
      .select("source").collect().map(_.getString(0)).toSet
    assert(flagged == touched,
      s"stale flags $flagged != sources touched by the delete $touched")
    assert(flagged.nonEmpty, "fixture too easy: delete touched nothing")

    // compact settles the sketch debt: stale clears, every field
    // back at its build-fresh guarantee
    CorpusStore.compact(spark, st, liveCorpus = Some(net))
    assert(st.stats.get.stats(spark).filter(col("stale")).isEmpty,
      "stale flags survived compact")
    assert(readout(st.stats.get) == readout(freshNet),
      "compacted stats tier != from-scratch net build")
  }

  test("liveCounts: a sub-shingle-width doc counts in ann and text " +
      "but never signs — the documented healthy offset, not " +
      "split-brain (and the default dials re-key to idCol)") {
    import spark.implicits._
    val tiny = spark.range(60).select(col("id").as("doc_id"),
      // id 2 is shorter than the shingle width (2 tokens < k = 3):
      // it can never LSH-match anything, so the curation store
      // rightly has no record of it
      when(col("id") === 2, "hello world")
        .otherwise(concat(lit("tok"), col("id"),
          lit(" alpha beta gamma"))).as("text"),
      transform(sequence(lit(0), lit(63)),
        j => (col("id") * j % 7).cast("float") / 7f).as("embedding"))
    // default dials: CorpusDials' moduli re-keyed to doc_id —
    // centroid rows (7, 57) and seed rows (3, 13, ...) exist
    val st = CorpusStore.build(tiny, "doc_id", "text", "embedding",
      s"$tmp/tiny")
    assert(CorpusStore.liveCounts(spark, st) == ((59L, 60L, 60L)),
      "expected the curation count one short of ann/text")
  }

  test("screened ingest admits exactly the kept survivors, and a " +
      "replay after a fabricated mid-crash reproduces the original " +
      "decisions (the self-exclusion) and converges every tier") {
    val base = corpus.filter(col("doc_id") % 2 === 0)
    val batch = corpus.filter(col("doc_id") % 2 === 1)
    // even-id base: centroid/seed moduli must land on even ids
    val evenDials = AnnIndexStore.Dials(
      col("doc_id") % 50 === 8, col("doc_id") % 10 === 4,
      m = 2, subDim = 32, iters = 2)
    val st = CorpusStore.build(base, "doc_id", "text", "embedding",
      s"$tmp/gated", annDials = Some(evenDials))
    def decided(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("status"))).toMap
    // the decisions the gate SHOULD make, collected before any fold
    val expected = decided(
      CurationStore.screen(spark, st.curation,
        batch.select(col("doc_id"), col("text")), "text"))
    val nKept = expected.valuesIterator.count(_ == "kept").toLong
    assert(expected.valuesIterator.exists(_ == "hist_dup") &&
      expected.valuesIterator.exists(_ == "batch_dup"),
      s"fixture carries no dups to gate on: " +
        s"${expected.values.groupBy(identity).view.mapValues(_.size).toMap}")
    // fabricate the crash: the curation tier already folded the
    // survivors under the transaction's id, then the coordinator
    // died before reaching ann/text
    val keptRows = {
      import spark.implicits._
      batch.join(
        expected.filter(_._2 == "kept").keys.toSeq.toDF("doc_id"),
        Seq("doc_id"), "left_semi")
    }
    CurationStore.update(st.curation,
      keptRows.select(col("doc_id"), col("text")), "text",
      batchId = Some("s1"))
    // replay the WHOLE transaction: the screen must reproduce the
    // original decisions (its history excludes the batch's own ids,
    // so the already-folded survivors don't read as hist_dups) and
    // the remaining tiers must fold exactly the kept set
    val (_, decisions) = CorpusStore.ingestScreened(st, batch, "text",
      "embedding", "s1")
    assert(decided(decisions) == expected,
      "replayed screen drifted from the pre-crash decisions")
    val n = base.count() + nKept
    val (c, a, t) = CorpusStore.liveCounts(spark, st)
    assert((a, t) == ((n, n)),
      s"ann/text hold $a/$t live docs, expected $n")
    assert(c == Dedup.minhashSignatures(
        base.unionByName(keptRows), "doc_id", "text", 16).count(),
      "curation count != signable admitted corpus")
    // a full second replay is a no-op everywhere
    val (_, d2) = CorpusStore.ingestScreened(st, batch, "text",
      "embedding", "s1")
    assert(decided(d2) == expected &&
      CorpusStore.liveCounts(spark, st) == ((c, a, t)),
      "batchId replay re-applied somewhere")
  }

  test("ingestScreenedAttributed: every rejection names its " +
      "evidence — the lexical winner for hist_dups, the nearest " +
      "stored neighbor + adc for semantic_dups, nulls for kept — " +
      "and dropping the receipt recovers the plain gate exactly") {
    import spark.implicits._
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(j => ((seed * 31 + j * 7) % 13 - 6) / 6f)
    def words(seed: Int): String =
      (0 until 8).map(i => s"w${seed}x$i").mkString(" ")
    // stored corpus carries the re-keyed dial rows (7 = centroid,
    // 3/13 = PQ seeds); texts are pairwise-disjoint word sets
    val stored = Seq(3L, 7L, 13L, 20L, 21L, 22L, 23L)
      .map(i => (i, words(i.toInt), vec(i.toInt)))
      .toDF("doc_id", "text", "embedding")
    val st = CorpusStore.build(stored, "doc_id", "text", "embedding",
      s"$tmp/attr")
    // batch: 101 duplicates stored 20's VECTOR under fresh text
    // (semantic axis), 105 duplicates stored 21's TEXT under a fresh
    // vector (lexical axis), 104 is new on both axes
    // far-vector seeds 55/77 are the AnnIndexStoreSpec semanticDups
    // fixture's (proven separated under this 2-codeword PQ)
    val batch = Seq(
      (101L, words(101), vec(20)),
      (105L, words(21), vec(55)),
      (104L, words(104), vec(77))).toDF("doc_id", "text", "embedding")
    // calibrate tau strictly between the vector-duplicate's
    // quantization error and every non-duplicate's top-1 (the
    // semanticDups scaladoc's dial discipline), and capture the
    // probe's own argmax — the gate's receipt must carry IT
    val probe = AnnIndexStore.semanticDups(spark, st.ann,
        batch.select(col("doc_id"), col("embedding")), "doc_id",
        "embedding", tau = Double.MaxValue, nprobe = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val tau = (probe(101L)._2 +
      Seq(104L, 105L).map(probe(_)._2).min) / 2
    assert(probe(101L)._2 < tau,
      s"fixture not separated under PQ: $probe")
    val (_, attributed) = CorpusStore.ingestScreenedAttributed(st,
      batch, "text", "embedding", "attr-1", semanticTau = Some(tau),
      semanticNprobe = 2)
    assert(attributed.columns.toSeq ==
      Seq("doc_id", "status", "dup_of", "adc"),
      s"receipt columns: ${attributed.columns.toSeq}")
    val rows = attributed.collect().map(r => r.getLong(0) ->
      ((r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(rows(101L)._1 == "semantic_dup" &&
      rows(101L)._2 == Some(probe(101L)._1) &&
      rows(101L)._3 == Some(probe(101L)._2),
      s"semantic receipt drifted from semanticDups' top-1: $rows")
    assert(rows(101L)._3.exists(_ <= tau),
      s"semantic_dup carries an adc over its own tau: $rows")
    assert(rows(105L)._1 == "hist_dup" && rows(105L)._2 == Some(21L)
        && rows(105L)._3.isEmpty,
      s"lexical receipt wrong (want stored 21, null adc): $rows")
    assert(rows(104L) == (("kept", None, None)),
      s"kept row carries evidence: $rows")
    // the PLAIN gate is this one minus the receipt — replayed under
    // the same batchId, so the folds no-op and the decisions must
    // reproduce column-for-column
    val (_, plain) = CorpusStore.ingestScreened(st, batch, "text",
      "embedding", "attr-1", semanticTau = Some(tau),
      semanticNprobe = 2)
    assert(plain.columns.toSeq == Seq("doc_id", "status"),
      s"plain gate leaked receipt columns: ${plain.columns.toSeq}")
    assert(plain.collect().map(r => r.getLong(0) -> r.getString(1))
        .toMap == rows.view.mapValues(_._1).toMap,
      "projection away from the receipt drifted from the plain gate")
  }

  test("gatePreview: the read-only door returns exactly the decision " +
      "frame the gated ingest acts on — and folds nothing, records " +
      "no batch pin, appends no gate-log row") {
    import spark.implicits._
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(j => ((seed * 31 + j * 7) % 13 - 6) / 6f)
    def words(seed: Int): String =
      (0 until 8).map(i => s"w${seed}x$i").mkString(" ")
    val stored = Seq(3L, 7L, 13L, 20L, 21L, 22L, 23L)
      .map(i => (i, words(i.toInt), vec(i.toInt)))
      .toDF("doc_id", "text", "embedding")
    val st = CorpusStore.build(stored, "doc_id", "text", "embedding",
      s"$tmp/preview")
    // the attribution fixture: 101 = vector dup of stored 20,
    // 105 = text dup of stored 21, 104 fresh on both axes
    val batch = Seq(
      (101L, words(101), vec(20)),
      (105L, words(21), vec(55)),
      (104L, words(104), vec(77))).toDF("doc_id", "text", "embedding")
    val probe = AnnIndexStore.semanticDups(spark, st.ann,
        batch.select(col("doc_id"), col("embedding")), "doc_id",
        "embedding", tau = Double.MaxValue, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val tau = (probe(101L) + Seq(104L, 105L).map(probe(_)).min) / 2
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        ((r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    val countsBefore = CorpusStore.liveCounts(spark, st)
    val previewRows = rowsOf(CorpusStore.gatePreview(st, batch,
      "text", "embedding", semanticTau = Some(tau),
      semanticNprobe = 2))
    // READ-ONLY: nothing folded, nothing logged
    assert(CorpusStore.liveCounts(spark, st) == countsBefore,
      "gatePreview folded rows into a tier")
    assert(!new java.io.File(s"${st.curation.dir}/gate_log").exists(),
      "gatePreview appended a gate-log row")
    // the COMMITTED gate, same batch, same store state: the preview
    // must equal the decision frame the ingest acts on, per-column
    val (_, attributed) = CorpusStore.ingestScreenedAttributed(st,
      batch, "text", "embedding", "prev-1", semanticTau = Some(tau),
      semanticNprobe = 2)
    assert(previewRows == rowsOf(attributed),
      "preview drifted from the gated ingest's decision frame")
    // with a VERSIONED benchmark mounted, the preview stamps the
    // LIVE revision's bench_rev but records no `_gate` pin — the
    // determinism contract starts at the committed gate's batchId
    val bs = BenchmarkStore.build(
      sf("documents").filter(col("doc_id") % 100 === 7)
        .select(col("doc_id"), col("text")),
      "doc_id", "text", s"$tmp/preview-eval")
    val p2 = CorpusStore.gatePreview(st,
      Seq((301L, words(301), vec(56)))
        .toDF("doc_id", "text", "embedding"),
      "text", "embedding", benchmarkStore = Some(bs))
    assert(p2.columns.contains("bench_rev") &&
      p2.select("bench_rev").distinct().collect()
        .map(_.getInt(0)).toSeq == Seq(1),
      "preview did not stamp the live benchmark revision")
    val gateDir = new java.io.File(s"${bs.dir}/_gate")
    assert(!gateDir.exists() ||
      gateDir.listFiles().forall(_.getName.contains(".tmp-")),
      "gatePreview recorded a batch pin")
  }

  test("versioned benchmark gate: a benchmark REVISION landing " +
      "between a gated ingest and its replay does not move the " +
      "decisions (pin-by-batchId), the decisions carry the gating " +
      "revision, and a NEW transaction pins the new revision") {
    val base = corpus.filter(col("doc_id") % 2 === 0)
    val batch = corpus.filter(col("doc_id") % 2 === 1)
    val evenDials = AnnIndexStore.Dials(
      col("doc_id") % 50 === 8, col("doc_id") % 10 === 4,
      m = 2, subDim = 32, iters = 2)
    val st = CorpusStore.build(base, "doc_id", "text", "embedding",
      s"$tmp/vbench", annDials = Some(evenDials))
    val bs = BenchmarkStore.build(
      sf("documents").filter(col("doc_id") % 100 === 7)
        .select(col("doc_id"), col("text")),
      "doc_id", "text", s"$tmp/vbench-eval")
    def decided(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[String]("status"), r.getAs[Int]("bench_rev")))).toMap
    val (_, d1f) = CorpusStore.ingestScreened(st, batch, "text",
      "embedding", "vb-1", benchmarkStore = Some(bs))
    val d1 = decided(d1f)
    assert(d1.values.exists(_._1 == "contaminated") &&
      d1.values.exists(_._1 == "kept"),
      s"fixture not sharp: ${d1.values.map(_._1).groupBy(identity)
        .view.mapValues(_.size).toMap}")
    assert(d1.values.forall(_._2 == 1),
      "first gate did not record revision 1")
    val counts = CorpusStore.liveCounts(spark, st)
    // REVISE with the batch's own text: an UNPINNED replay would now
    // flag every shingled batch doc contaminated — the sharpest
    // possible drift. The recorded pin must hold the decisions.
    BenchmarkStore.revise(bs,
      batch.select(col("doc_id"), col("text")), "doc_id", "text")
    val (_, d2f) = CorpusStore.ingestScreened(st, batch, "text",
      "embedding", "vb-1", benchmarkStore = Some(bs))
    assert(decided(d2f) == d1,
      "replayed gated decisions drifted under a benchmark revision")
    assert(CorpusStore.liveCounts(spark, st) == counts,
      "batchId replay re-applied somewhere")
    // a NEW transaction is gated by the live (revised) eval set
    assert(BenchmarkStore.pinForBatch(spark, bs, "vb-2").seq == 2,
      "a fresh batch did not pin the new revision")
    // RETENTION vs the recorded pin: another revision lands — under
    // bare retain=1 GC, revision 1's shingles AND snapshot would now
    // be gone and the replay below would die at FileNotFound. The
    // `_gate` record protects exactly the pinned seq, so a LATE
    // replay (crash recovered days later) still reproduces.
    BenchmarkStore.revise(bs,
      sf("documents").filter(col("doc_id") % 100 === 23)
        .select(col("doc_id"), col("text")), "doc_id", "text")
    val (_, d3f) = CorpusStore.ingestScreened(st, batch, "text",
      "embedding", "vb-1", benchmarkStore = Some(bs))
    assert(decided(d3f) == d1,
      "late replay broke once retention passed the pinned revision")
    // releasing the SETTLED batch is the retention bound: the pin
    // stops protecting, the next revision ages revision 1 out, and
    // a historical resolve fails loudly (the expired-snapshot rule)
    BenchmarkStore.releaseBatch(spark, bs, "vb-1")
    BenchmarkStore.revise(bs,
      sf("documents").filter(col("doc_id") % 100 === 31)
        .select(col("doc_id"), col("text")), "doc_id", "text")
    intercept[IllegalStateException] { bs.pinAt(spark, 1) }
    // a claimant that died between its atomic create and its one
    // content write leaves an EMPTY record: the replay fails loudly
    // with the remedy in the message (the crash preceded every tier
    // fold — pins happen first — so delete-and-re-run is safe)
    val crashed = new java.io.File(s"${bs.dir}/_gate/vb-crashed")
    crashed.getParentFile.mkdirs()
    assert(crashed.createNewFile())
    val e = intercept[IllegalStateException] {
      BenchmarkStore.pinForBatch(spark, bs, "vb-crashed")
    }
    assert(e.getMessage.contains("delete the record"), e.getMessage)
  }

  test("retroContamination: postings-reconstructed shingles equal a " +
      "raw-text recompute exactly, masked deletes leave the audit, " +
      "and a quarantine delete of the flagged set comes back clean") {
    import spark.implicits._
    val evenDials = AnnIndexStore.Dials(
      col("doc_id") % 50 === 8, col("doc_id") % 10 === 4,
      m = 2, subDim = 32, iters = 2)
    val st = CorpusStore.build(corpus.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", "embedding", s"$tmp/retro",
      annDials = Some(evenDials))
    val bs = BenchmarkStore.build(
      sf("documents").filter(col("doc_id") % 100 === 6)
        .select(col("doc_id"), col("text")),
      "doc_id", "text", s"$tmp/retro-eval")
    def audit() = CorpusStore.retroContamination(spark, st, bs, 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val flagged = audit()
    assert(flagged.nonEmpty && flagged.forall(_._3 == 1),
      s"fixture not sharp / wrong revision stamp: $flagged")
    // ground truth from the RAW TEXT — the reconstruction off the
    // positional postings must reproduce it shingle-for-shingle
    val sh = Dedup.shingleRows(
      sf("documents").filter(col("doc_id") % 2 === 0),
      "doc_id", "text", 3)
    val bsh = Dedup.shingleRows(
      sf("documents").filter(col("doc_id") % 100 === 6),
      "doc_id", "text", 3).select("s").distinct()
    val expected = sh.join(bsh, Seq("s"), "left_semi")
      .groupBy("doc_id").agg(countDistinct("s").as("n"))
      .filter(col("n") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), 1)).toSet
    assert(flagged == expected,
      s"postings reconstruction drifted from raw text:\n" +
        s"got      ${flagged.toSeq.sorted}\n" +
        s"expected ${expected.toSeq.sorted}")
    // a masked delete leaves the audit immediately (no compact run)
    val victim = flagged.map(_._1).min
    CorpusStore.delete(st, Seq(victim).toDF("doc_id"), "retro-del")
    val after = audit()
    assert(after == flagged.filterNot(_._1 == victim),
      s"tombstoned doc resurfaced (or others moved): $after")
    // quarantine the rest transactionally; the audit comes back clean
    CorpusStore.delete(st,
      after.map(_._1).toSeq.toDF("doc_id"), "retro-quarantine")
    assert(audit().isEmpty, "quarantined docs still flagged")
  }

  test("transaction-level clone: the quad as of a capture serves " +
      "the captured epochs coherently from a fresh root, the source " +
      "is untouched, and the source's post-capture batch id rolls " +
      "the clone forward (fresh lineage)") {
    val docs = sf("documents")
    val emb = sf("embeddings")
    val corpusS = docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(docs("doc_id"), col("text"), col("source"),
        col("embedding"))
    val base = corpusS.filter(col("doc_id") % 5 =!= 4)
    val batch = corpusS.filter(col("doc_id") % 5 === 4)
    val st = CorpusStore.build(base, "doc_id", "text", "embedding",
      s"$tmp/clq", annDials = Some(dials), sourceCol = Some("source"))
    val cap = CorpusStore.snapshotSeqs(spark, st)
    CorpusStore.ingest(st, batch, "text", "embedding", "cl-b1")
    val clone = CorpusStore.cloneAt(spark, st, cap, s"$tmp/clq-fork")
    // membership: every clone tier is at the capture, every source
    // tier at the folded state — the quad's coherence, frozen
    val nb = base.count()
    val nf = nb + batch.count()
    assert(CorpusStore.liveCountsAll(spark, clone)
      == ((nb, nb, nb, Some(nb))),
      "clone tiers disagree with the captured membership")
    assert(CorpusStore.liveCountsAll(spark, st)
      == ((nf, nf, nf, Some(nf))),
      "the clone touched the source's membership")
    // serving coherence per tier: the clone's LIVE serve equals the
    // source's historical pin at the captured seq
    assertFrameEqual(TextIndexStore.bm25(spark, clone.text, terms),
      TextIndexStore.bm25Of(spark, st.text.pinAt(spark, cap.text),
        terms), "clone text serve vs pinned epoch")
    assertFrameEqual(clone.curation.labels(spark),
      st.curation.pinAt(spark, cap.curation).labels(spark),
      "clone labels vs pinned epoch")
    assertFrameEqual(
      clone.stats.get.stats(spark)
        .select("source", "docs", "token_occurrences"),
      st.stats.get.statsAt(spark, cap.stats.get)
        .select("source", "docs", "token_occurrences"),
      "clone monitoring rows vs pinned epoch")
    // fresh lineage: the SAME batch id the source already folded
    // rolls the clone forward to the source's state
    CorpusStore.ingest(clone, batch, "text", "embedding", "cl-b1")
    assert(CorpusStore.liveCountsAll(spark, clone)
      == ((nf, nf, nf, Some(nf))),
      "the source's batch id did not fold into the fresh lineage")
    assertFrameEqual(TextIndexStore.bm25(spark, clone.text, terms),
      TextIndexStore.bm25(spark, st.text, terms),
      "rolled-forward clone != source")

    // convergence under replay, both crash shapes fabricated:
    // (a) a committed PREFIX — the coordinator died after tier 1's
    // birth-flip, so the curation tier is complete and the re-run
    // must skip it VERBATIM while cloning the rest;
    // (b) a TORN tier — half-copied debris without a manifest, which
    // the re-run sweeps and redoes from scratch
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val cap2 = CorpusStore.snapshotSeqs(spark, st)
    val root2 = s"$tmp/clq-fork2"
    CurationStore.cloneAt(spark, st.curation, cap2.curation,
      s"$root2/curation")
    val curCommitted = StoreVersions.read(fs, s"$root2/curation")
    val torn = new org.apache.hadoop.fs.Path(
      s"$root2/text/postings/v-00001/torn.parquet")
    fs.mkdirs(torn.getParent)
    fs.create(torn).close()
    val clone2 = CorpusStore.cloneAt(spark, st, cap2, root2)
    assert(StoreVersions.read(fs, s"$root2/curation") == curCommitted,
      "the resume re-cloned a committed tier")
    assert(!fs.exists(torn),
      "the resume did not sweep the torn tier's debris")
    assert(CorpusStore.liveCountsAll(spark, clone2)
      == ((nf, nf, nf, Some(nf))),
      "the resumed clone's tiers disagree with the capture")
    assertFrameEqual(TextIndexStore.bm25(spark, clone2.text, terms),
      TextIndexStore.bm25(spark, st.text, terms),
      "the resumed clone's text tier drifted")
  }

  test("transaction rollback: snapshotSeqs captured before an ingest " +
      "undo it across all four tiers; a replayed rollback converges; " +
      "the undone batchId folds again") {
    val base = corpus.filter(col("doc_id") % 4 =!= 3)
    val batch = corpus.filter(col("doc_id") % 4 === 3)
    val docs = sf("documents")
    val src = docs.select(col("doc_id"), col("source"))
    val withSrc = (df: org.apache.spark.sql.DataFrame) =>
      df.join(src, "doc_id")
    val st = CorpusStore.build(withSrc(base), "doc_id", "text",
      "embedding", s"$tmp/rb", annDials = Some(dials),
      sourceCol = Some("source"))
    val n0 = base.count()
    val labels0 = st.curation.labels(spark).collect()
      .map(_.toString).sorted.toSeq
    val bm0 = TextIndexStore.bm25(spark, st.text, terms).collect()
      .map(_.toString).sorted.toSeq
    def statsReadout() = st.stats.get.stats(spark)
      .select("source", "docs", "token_occurrences", "stale").collect()
      .map(_.toString).sorted.toSeq
    val stats0 = statsReadout()

    val seqs = CorpusStore.snapshotSeqs(spark, st)
    assert(seqs.stats.isDefined, "fixture: the stats tier is mounted")
    CorpusStore.ingest(st, withSrc(batch), "text", "embedding",
      "rb-tx-1")
    assert(CorpusStore.liveCounts(spark, st) !=
      ((n0, n0, n0)), "fixture: the ingest should have landed")

    CorpusStore.rollback(spark, st, seqs)
    assert(CorpusStore.liveCounts(spark, st) == ((n0, n0, n0)),
      "rollback did not restore all three serving counters")
    assert(st.curation.labels(spark).collect()
        .map(_.toString).sorted.toSeq == labels0,
      "rollback did not restore the label map")
    assert(TextIndexStore.bm25(spark, st.text, terms).collect()
        .map(_.toString).sorted.toSeq == bm0,
      "rollback did not restore text serving")
    assert(statsReadout() == stats0,
      "rollback did not restore the monitoring tier")

    // a coordinator crash mid-rollback replays the SAME call — each
    // store's rollback re-runs idempotently at its target seq (the
    // target snapshot deliberately survives the rollback's own flip)
    CorpusStore.rollback(spark, st, seqs)
    assert(CorpusStore.liveCounts(spark, st) == ((n0, n0, n0)),
      "replayed rollback diverged")

    // the rollback re-opened the batch id: the same transaction
    // folds again for real
    CorpusStore.ingest(st, withSrc(batch), "text", "embedding",
      "rb-tx-1")
    val nAll = corpus.count()
    assert(CorpusStore.liveCounts(spark, st) == ((nAll, nAll, nAll)),
      "an undone transaction id must fold again")
  }

  test("membershipDiff: adds and takedowns between two captures, " +
      "NET across a span (a doc added then deleted inside it " +
      "appears nowhere), empty at equal epochs") {
    val retainKey = StoreVersions.RetainVersions
    val prev = spark.conf.getOption(retainKey)
    // the diff's lookback rides time-travel retention: two flips
    // separate e0 from e2 below, so retain 2 prior versions
    spark.conf.set(retainKey, "2")
    try {
      val base = corpus.filter(col("doc_id") % 5 =!= 4)
      val batch = corpus.filter(col("doc_id") % 5 === 4)
      val doomed = corpus.filter(col("doc_id") % 10 === 1 ||
        col("doc_id") % 10 === 4).select("doc_id")
      val st = CorpusStore.build(base, "doc_id", "text", "embedding",
        s"$tmp/diff", annDials = Some(dials))
      val e0 = CorpusStore.snapshotSeqs(spark, st)
      CorpusStore.ingest(st, batch, "text", "embedding", "diff-b1")
      val e1 = CorpusStore.snapshotSeqs(spark, st)
      CorpusStore.delete(st, doomed, "diff-d1")
      val e2 = CorpusStore.snapshotSeqs(spark, st)

      def diff(a: CorpusStore.Epochs, b: CorpusStore.Epochs) =
        CorpusStore.membershipDiff(spark, st, a, b).collect()
          .map(r => (r.getLong(0), r.getString(1))).toSet
      def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
        df.select("doc_id").collect().map(_.getLong(0)).toSet

      assert(diff(e0, e1) == ids(batch).map((_, "added")),
        "e0->e1 is exactly the ingested batch")
      assert(diff(e1, e2) == ids(doomed).map((_, "removed")),
        "e1->e2 is exactly the takedown")
      // NET across the span: batch ids deleted inside it (%10==4)
      // appear nowhere; base ids deleted (%10==1) are removals
      val netAdded = ids(batch.filter(col("doc_id") % 10 =!= 4))
      val netRemoved = ids(corpus.filter(col("doc_id") % 10 === 1))
      assert(diff(e0, e2) == netAdded.map((_, "added")) ++
        netRemoved.map((_, "removed")),
        "e0->e2 is not the net membership change")
      assert(diff(e1, e1).isEmpty, "equal epochs must diff empty")
    } finally prev match {
      case Some(v) => spark.conf.set(retainKey, v)
      case None => spark.conf.unset(retainKey)
    }
  }
}
