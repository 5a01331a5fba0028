package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The transactional quarantine's contract ([[CorpusStore
  * .quarantine]]): the audit's flagged frame is PINNED per batchId
  * BEFORE any tier folds the delete, because the audit reads the
  * text tier's postings — after a partial fold a re-audit would see
  * the flagged docs already masked and flag nothing, leaving the
  * remaining tiers permanently unfolded. So replays must serve the
  * recorded frame verbatim (spec-fabricated: the pinned-then-one-
  * tier-folded crash state), a clean audit must still pin its
  * receipt (that receipt is [[Advisor.adviseRetro]]'s `ok`), and
  * the advisory loop revision → audit → receipt → `ok` must close.
  */
class QuarantineSpec extends SparkSpec {

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("quarantine").toString
  private lazy val corpus = {
    val docs = sf("documents")
    val emb = sf("embeddings")
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(docs("doc_id"), col("text"), col("embedding"))
  }
  private lazy val evenDials = AnnIndexStore.Dials(
    col("doc_id") % 50 === 8, col("doc_id") % 10 === 4,
    m = 2, subDim = 32, iters = 2)

  private def buildQuad(sub: String) =
    CorpusStore.build(corpus.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", "embedding", s"$tmp/$sub",
      annDials = Some(evenDials))

  private def flaggedSet(df: org.apache.spark.sql.DataFrame)
      : Set[(Long, Long, Int)] =
    df.select("doc_id", "n_overlap", "bench_rev").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("quarantine pins the audit, folds the delete across tiers, " +
      "comes back clean, and a replay serves the PIN (a re-audit " +
      "would already see masked postings)") {
    val st = buildQuad("q1")
    val bs = BenchmarkStore.build(
      sf("documents").filter(col("doc_id") % 100 === 6)
        .select(col("doc_id"), col("text")),
      "doc_id", "text", s"$tmp/q1-eval")
    val expected = flaggedSet(
      CorpusStore.retroContamination(spark, st, bs, 2))
    assert(expected.nonEmpty, "fixture not sharp: empty audit")
    val (c0, a0, t0) = CorpusStore.liveCounts(spark, st)

    val (st2, flagged) = CorpusStore.quarantine(spark, st, bs, "qb1")
    assert(flaggedSet(flagged) == expected,
      "quarantine's pinned frame drifted from the direct audit")
    assert(flagged.columns.toSeq ==
      Seq("doc_id", "n_overlap", "bench_rev", "batch_id"),
      s"record schema: ${flagged.columns.toSeq}")
    val n = expected.size
    assert(CorpusStore.liveCounts(spark, st2) ==
      ((c0 - n, a0 - n, t0 - n)),
      "the flagged docs did not leave every tier exactly once")
    assert(CorpusStore.retroContamination(spark, st2, bs, 2).isEmpty,
      "audit not clean after quarantine")

    // replay: the recorded frame verbatim — NOT the (now empty)
    // re-audit — and no tier folds twice
    val (st3, replay) = CorpusStore.quarantine(spark, st2, bs, "qb1")
    assert(flaggedSet(replay) == expected,
      "replay did not serve the pinned audit frame")
    assert(CorpusStore.liveCounts(spark, st3) ==
      ((c0 - n, a0 - n, t0 - n)), "replay re-applied somewhere")
    // the receipt closes the advisory loop
    assertSameRows(Advisor.adviseRetro(spark, st3, bs),
      Seq(Seq("corpus", "retro_audit_rev", 1.0, 1.0, "ok")))
  }

  test("crash between the pin and the folds: the replay converges " +
      "every tier off the recorded frame") {
    val st = buildQuad("q2")
    val bs = BenchmarkStore.build(
      sf("documents").filter(col("doc_id") % 100 === 6)
        .select(col("doc_id"), col("text")),
      "doc_id", "text", s"$tmp/q2-eval")
    val expected = flaggedSet(
      CorpusStore.retroContamination(spark, st, bs, 2))
    val (c0, a0, t0) = CorpusStore.liveCounts(spark, st)
    // fabricate: the pin landed, then ONE tier folded, then the
    // coordinator died
    val pinned = CorpusStore.quarantinePin(spark, st, bs, "qc1", 2)
    TextIndexStore.delete(st.text, pinned.select("doc_id"),
      batchId = Some("qc1"))
    // the text tier's postings are now masked — an unpinned re-audit
    // would flag nothing; the replay must not care
    val (st2, flagged) = CorpusStore.quarantine(spark, st, bs, "qc1")
    assert(flaggedSet(flagged) == expected,
      "replay after crash did not serve the pinned audit")
    val n = expected.size
    assert(CorpusStore.liveCounts(spark, st2) ==
      ((c0 - n, a0 - n, t0 - n)),
      "crash replay did not converge the tiers")
  }

  test("a CLEAN audit still pins its receipt; the advisory loop " +
      "revision -> audit -> receipt -> ok closes; a rebuild starts " +
      "a fresh quarantine history") {
    import spark.implicits._
    val st = buildQuad("q3")
    // an eval set foreign to the corpus: guaranteed-clean audit
    val foreign = Seq((900001L, "zq1 zq2 zq3 zq4 zq5"),
      (900002L, "zq6 zq7 zq8 zq9 zq10")).toDF("doc_id", "text")
    val bs = BenchmarkStore.build(foreign, "doc_id", "text",
      s"$tmp/q3-eval")
    // never audited + live revision 1 → audit advised
    assertSameRows(Advisor.adviseRetro(spark, st, bs),
      Seq(Seq("corpus", "retro_audit_rev", 0.0, 1.0, "audit")))
    val seqs0 = CorpusStore.snapshotSeqs(spark, st)
    val (st2, flagged) = CorpusStore.quarantine(spark, st, bs, "qz1")
    assert(flagged.isEmpty, "foreign eval set flagged something")
    assert(CorpusStore.snapshotSeqs(spark, st2) == seqs0,
      "a clean quarantine flipped a store")
    assertSameRows(Advisor.adviseRetro(spark, st2, bs),
      Seq(Seq("corpus", "retro_audit_rev", 1.0, 1.0, "ok")))
    // a revision re-opens the advisory; its audit closes it again
    val bs2 = BenchmarkStore.revise(bs,
      Seq((900003L, "zq11 zq12 zq13 zq14")).toDF("doc_id", "text"),
      "doc_id", "text")
    assertSameRows(Advisor.adviseRetro(spark, st2, bs2),
      Seq(Seq("corpus", "retro_audit_rev", 1.0, 2.0, "audit")))
    val (st3, _) = CorpusStore.quarantine(spark, st2, bs2, "qz2")
    assertSameRows(Advisor.adviseRetro(spark, st3, bs2),
      Seq(Seq("corpus", "retro_audit_rev", 2.0, 2.0, "ok")))
    // a rebuild is a fresh corpus life: receipts do not carry over
    val st4 = buildQuad("q3")
    assertSameRows(Advisor.adviseRetro(spark, st4, bs2),
      Seq(Seq("corpus", "retro_audit_rev", 0.0, 2.0, "audit")))
  }

  test("incremental quarantine audits ONLY the docs admitted since " +
      "the last same-revision receipt (an old borderline doc stays " +
      "out of the delta audit but a full audit still sees it), and " +
      "a benchmark revision falls back to the full audit") {
    import spark.implicits._
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(j => ((seed * 31 + j * 7) % 13 - 6) / 6f)
    val retainKey = StoreVersions.RetainVersions
    val prev = spark.conf.getOption(retainKey)
    // the incremental lookback rides time-travel retention: the
    // receipt's membership snapshot must survive the quarantine's
    // own delete flip plus the next ingest flip
    spark.conf.set(retainKey, "3")
    try {
      val bs = BenchmarkStore.build(
        sf("documents").filter(col("doc_id") % 100 === 6)
          .select(col("doc_id"), col("text")),
        "doc_id", "text", s"$tmp/q4-eval")
      val evalText = sf("documents")
        .filter(col("doc_id") % 100 === 6).orderBy("doc_id")
        .select("text").head().getString(0)
      val evalTokens = evalText.split(" ", -1)
      assert(evalTokens.length >= 6, "eval doc too short for fixture")
      // planted OLD doc overlapping the eval set by EXACTLY 2
      // shingles (first 4 eval tokens → 2 trigrams): survives a
      // minOverlap=3 full pass, and must stay out of a later
      // minOverlap=2 DELTA pass — only a FULL pass may flag it
      val planted = evalTokens.take(4).mkString(" ")
      val base = corpus.filter(col("doc_id") % 2 === 0).unionByName(
        Seq((900002L, planted, vec(56))).toDF(
          "doc_id", "text", "embedding"))
      val st = CorpusStore.build(base, "doc_id", "text", "embedding",
        s"$tmp/q4", annDials = Some(evenDials))
      // receipt 1: FULL audit at minOverlap=3 (planted doc survives)
      val (st1, f1) = CorpusStore.quarantine(spark, st, bs, "q4-full",
        minOverlap = 3)
      assert(!flaggedSet(f1).exists(_._1 == 900002L),
        "fixture broken: the 2-overlap doc fell to a 3-overlap pass")
      // new batch: one contaminated doc (a full eval text), one
      // clean doc
      CorpusStore.ingest(st1, Seq(
          (900006L, evalText, vec(55)),
          (900004L, "xq1 xq2 xq3 xq4 xq5 xq6", vec(77)))
        .toDF("doc_id", "text", "embedding"),
        "text", "embedding", "q4-b1")
      // DELTA audit at minOverlap=2: flags the new contaminated doc,
      // NOT the old 2-overlap doc (which only a full pass may see)
      val (st2, f2) = CorpusStore.quarantine(spark, st1, bs, "q4-inc",
        minOverlap = 2, incremental = true)
      assert(flaggedSet(f2).map(_._1) == Set(900006L),
        s"delta audit drifted: ${flaggedSet(f2)}")
      // contrast: a FULL audit at the same dial DOES see the old doc
      // (beside the corpus's own borderline 2-overlap population —
      // which the delta pass above rightly skipped wholesale)
      val full2 = flaggedSet(
        CorpusStore.retroContamination(spark, st2, bs, 2)).map(_._1)
      assert(full2.contains(900002L) && full2.size > 1,
        s"full-audit contrast drifted: $full2")
      // another incremental pass: nothing new arrived → empty
      val (st3, f3) = CorpusStore.quarantine(spark, st2, bs,
        "q4-inc2", minOverlap = 2, incremental = true)
      assert(f3.isEmpty, "empty delta audit flagged something")
      // a REVISION falls back to the full audit: the new eval set is
      // the planted doc's own text, so the OLD doc — invisible to
      // any delta — must be flagged, at the new revision stamp
      val bs2 = BenchmarkStore.revise(bs,
        Seq((910001L, planted)).toDF("doc_id", "text"),
        "doc_id", "text")
      val (_, f4) = CorpusStore.quarantine(spark, st3, bs2, "q4-rev",
        minOverlap = 2, incremental = true)
      assert(flaggedSet(f4).contains((900002L, 2L, 2)),
        s"revision did not force the full audit: ${flaggedSet(f4)}")
    } finally prev match {
      case Some(v) => spark.conf.set(retainKey, v)
      case None => spark.conf.unset(retainKey)
    }
  }
}
