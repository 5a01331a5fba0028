package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted BM25 index must be a pure materialization of the
  * from-text path (shared scoring kernel), its incremental fold must
  * equal a full rebuild bit-for-bit — including the floating scores,
  * which the integer-exact q159 oracle deliberately leaves to THIS
  * spec (one engine, one rounding) — and the serving scan must push
  * the term probe into the postings read.
  */
class TextIndexStoreSpec extends SparkSpec {

  private val terms = Seq("join", "vector", "stream")
  private lazy val docs = sf("documents").select("doc_id", "text")
  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("text-index").toString
  private lazy val idx =
    TextIndexStore.build(docs, "doc_id", "text", s"$tmp/full")

  private def fromCorpus = {
    val dl = docs.select(col("doc_id"),
      TextOps.tokenCount(col("text")).cast("bigint").as("dl"))
    val stats = dl.agg(count(lit(1)).as("_n"),
      (sum("dl") / count(lit(1))).as("_avgdl"))
    val tf = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    TextOps.bm25ScoreFrames(tf, dl, stats, "doc_id", terms)
  }

  private def assertFrameEqual(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, what: String): Unit = {
    assert(a.count() == b.count(), s"$what: row counts differ")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what: symmetric difference is non-empty")
  }

  test("stored-index bm25 equals the from-corpus kernel") {
    assertFrameEqual(TextIndexStore.bm25(spark, idx, terms),
      fromCorpus, "bm25 scores")
  }

  test("update == rebuild: postings, stats AND floating scores") {
    val old = docs.filter(col("doc_id") % 5 =!= 4)
    val batch = docs.filter(col("doc_id") % 5 === 4)
    val inc = TextIndexStore.build(old, "doc_id", "text", s"$tmp/inc")
    TextIndexStore.update(inc, batch, "text", Some("b1"))
    val full = TextIndexStore.build(docs, "doc_id", "text",
      s"$tmp/rebuild")
    assertFrameEqual(inc.postings(spark), full.postings(spark),
      "postings")
    assert(inc.stats(spark).collect().toSeq ==
      full.stats(spark).collect().toSeq, "stats counters differ")
    // the floating contract q159's integer oracle delegates here:
    // same engine, same rounding — every score must agree
    assertFrameEqual(TextIndexStore.bm25(spark, inc, terms),
      TextIndexStore.bm25(spark, full, terms), "scores after update")
    // a batchId replay is a detected no-op
    val n = inc.postings(spark).count()
    TextIndexStore.update(inc, batch, "text", Some("b1"))
    assert(inc.postings(spark).count() == n, "replay re-appended")
  }

  private def files(dir: String): Set[String] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    UpdateMarker.listFiles(fs, dir)
  }

  /** Data files of a stage's CURRENT version (manifest-resolved). */
  private def stageFiles(storeDir: String, stage: String): Set[String] = {
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    files(StoreVersions.resolve(fs, storeDir, stage))
  }

  test("compact folds per-update files; scores unchanged; a crash " +
      "after the committed flip settles without healing data") {
    val st = TextIndexStore.build(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", s"$tmp/cpt")
    TextIndexStore.update(st,
      docs.filter(col("doc_id") % 2 === 1 && col("doc_id") < 250),
      "text")
    TextIndexStore.update(st,
      docs.filter(col("doc_id") % 2 === 1 && col("doc_id") >= 250),
      "text")
    val before = stageFiles(st.dir, "postings").size
    val scores = TextIndexStore.bm25(spark, st, terms)
      .collect().map(_.toString).sorted.toSeq
    TextIndexStore.compact(spark, st)
    assert(stageFiles(st.dir, "postings").size < before,
      "compact did not reduce the postings file count")
    assert(TextIndexStore.bm25(spark, st, terms)
      .collect().map(_.toString).sorted.toSeq == scores,
      "compact changed scores")
    // fabricate the fatal window: compact committed its flip but
    // died before its marker delete — settlement must NOT heal the
    // listing diff away (the `.swap` maintenance kind)
    val fs = new org.apache.hadoop.fs.Path(st.dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    UpdateMarker.write(fs, UpdateMarker.markerPath(st.dir),
      UpdateMarker.State("", Map(
        "postings.swap" -> Set.empty[String],
        "doclens.swap" -> Set.empty[String])))
    TextIndexStore.update(st, docs.limit(0), "text")
    assert(TextIndexStore.bm25(spark, st, terms)
      .collect().map(_.toString).sorted.toSeq == scores,
      "maintenance-marker settlement deleted committed files")
  }

  test("build() settles the directory's previous life: a crashed " +
      "update's unflipped stats version and stale marker cannot " +
      "touch a rebuild's counters") {
    val dir = s"$tmp/rebuild-settle"
    val st0 = TextIndexStore.build(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", dir)
    // fabricate a crashed update: its next-version counters were
    // fully staged but never flipped, and its marker survived
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    import spark.implicits._
    Seq((999999L, 999999L)).toDF("n", "sumdl").write
      .parquet(StoreVersions.next(fs, dir, "stats"))
    UpdateMarker.write(fs, UpdateMarker.markerPath(dir),
      UpdateMarker.State("", Map(
        "stats" -> stageFiles(dir, "stats"))))
    val st = TextIndexStore.build(docs, "doc_id", "text", dir)
    val fresh = st.stats(spark).collect().toSeq
    assert(fresh != Seq(org.apache.spark.sql.Row(999999L, 999999L)),
      "the orphan staged counters leaked into the rebuild")
    // the next writer's settlement must keep the REBUILT counters
    TextIndexStore.update(st, docs.limit(0), "text")
    assert(st.stats(spark).collect().toSeq == fresh,
      "a stale crashed-update artifact rolled the rebuilt counters " +
        "back")
  }

  test("null-text docs index as one empty-token row (counters count " +
      "them) and special-character terms score (positional pivot)") {
    import spark.implicits._
    val d = Seq((1L, "alpha beta beta"), (2L, null),
      (3L, "alpha x.y `q`")).toDF("doc_id", "text")
    val st = TextIndexStore.build(d, "doc_id", "text", s"$tmp/nulls")
    // every doc gets a doclens row and the exact counters see all 3 —
    // the from-corpus kernel counts null-text docs too
    assert(st.doclens(spark).count() == 3L)
    assert(st.stats(spark).select("n").head.getLong(0) == 3L)
    // terms containing '.' and '`' must resolve through the pivot
    // (column names are positional, not raw-token-derived)
    val sc = TextIndexStore.bm25(spark, st, Seq("x.y", "`q`", "alpha"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sc.contains(3L) && sc(3L) > sc(1L),
      s"special-char terms did not score doc 3 above doc 1: $sc")
    // update path tokenizes null text the same way
    val st2 = TextIndexStore.build(d.filter(col("doc_id") === 1L),
      "doc_id", "text", s"$tmp/nulls-inc")
    TextIndexStore.update(st2, d.filter(col("doc_id") =!= 1L), "text")
    assert(st2.stats(spark).collect().toSeq ==
      st.stats(spark).collect().toSeq,
      "update-path counters diverge on null text")
  }

  test("hot-token salt bounds the stopword partition: a planted " +
      "stopword's postings span multiple files, scores salt-invariant") {
    import spark.implicits._
    // every doc contains the stopword 'the' plus a per-doc rare token
    val planted = spark.range(400).select(col("id").as("doc_id"),
      concat(lit("the common text the "), lit("rare"),
        col("id").cast("string")).as("text"))
    // at this toy SF every salted partition is tiny and AQE folds
    // them back together — disable coalescing to OBSERVE the layout
    // (at scale the hot partitions are large and never coalesce,
    // which is exactly when the salt matters)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
      "false")
    val st =
      try TextIndexStore.build(planted, "doc_id", "text",
        s"$tmp/stopword")
      finally spark.conf.unset(
        "spark.sql.adaptive.coalescePartitions.enabled")
    // the hot token's rows land in > 1 file — the write straggler
    // and the probe's monster row-group are both bounded by the salt
    val hotFiles = st.postings(spark).filter(col("token") === "the")
      .select(input_file_name()).distinct().count()
    assert(hotFiles >= 2,
      s"stopword postings funneled into $hotFiles file(s)")
    // salt is pure layout: rows and scores identical at salt=1
    spark.conf.set(TextIndexStore.PostingsSalt, "1")
    try {
      val unsalted = TextIndexStore.build(planted, "doc_id", "text",
        s"$tmp/stopword-unsalted")
      assert(TextIndexStore.bm25(spark, st, Seq("the", "rare7"))
          .collect().map(_.toString).sorted.toSeq ==
        TextIndexStore.bm25(spark, unsalted, Seq("the", "rare7"))
          .collect().map(_.toString).sorted.toSeq,
        "salting changed scores")
      assert(st.postings(spark).count() ==
        unsalted.postings(spark).count(), "salting changed rows")
    } finally spark.conf.unset(TextIndexStore.PostingsSalt)
  }

  private def planNodes(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def nodes(p: SparkPlan): Seq[SparkPlan] = (p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case s: QueryStageExec => s +: nodes(s.plan)
      case o => o +: o.children.flatMap(nodes)
    }) ++ p.subqueries.flatMap(nodes)
    nodes(df.queryExecution.executedPlan)
  }

  test("bucketed postings: scores equal the plain layout, the term " +
      "probe prunes to its buckets, token aggregation plans with " +
      "zero exchange on the postings side") {
    val st = TextIndexStore.build(docs, "doc_id", "text",
      s"$tmp/bucketed", bucketPostings = 8)
    assert(st.postingsTable.exists(spark.catalog.tableExists),
      "bucketed base not registered")
    // bit-identical serving across layouts
    assertFrameEqual(TextIndexStore.bm25(spark, st, terms),
      TextIndexStore.bm25(spark, idx, terms), "bucketed vs plain bm25")
    // the idf shape: token-keyed aggregation straight off the scan —
    // the bucketed table reports HashPartitioning(token), so the
    // aggregate needs NO exchange
    val agg = st.postings(spark)
      .filter(col("token").isin(terms: _*))
      .groupBy("token").agg(count(lit(1)).as("df"))
    val nodes = planNodes(agg)
    assert(!nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      "token aggregation over the bucketed base shuffled")
    // and the scan pruned to the probed terms' buckets
    val scan = nodes.collectFirst {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }.getOrElse(fail("no file scan under the aggregation"))
    val sel = scan.metadata.getOrElse("SelectedBucketsCount",
      fail("scan is not bucket-pruned (no SelectedBucketsCount)"))
    val selected = sel.trim.split(" ")(0).toInt
    assert(selected < 8, s"term probe read every bucket: $sel")
  }

  test("bucketed store maintenance: update lands in the delta " +
      "(scores == rebuild), compact folds it back and restores the " +
      "zero-exchange layout") {
    val dir = s"$tmp/bucketed-maint"
    val st = TextIndexStore.build(docs.filter(col("doc_id") % 3 =!= 0),
      "doc_id", "text", dir, bucketPostings = 8)
    TextIndexStore.update(st, docs.filter(col("doc_id") % 3 === 0),
      "text", Some("b3"))
    assert(st.deltaIfAny(spark).isDefined, "update did not use the delta")
    // base ∪ delta serves exactly the full rebuild's scores
    assertFrameEqual(TextIndexStore.bm25(spark, st, terms),
      TextIndexStore.bm25(spark, idx, terms), "delta-outstanding bm25")
    assert(st.stats(spark).collect().toSeq ==
      idx.stats(spark).collect().toSeq, "counters diverged")
    TextIndexStore.compact(spark, st)
    assert(st.deltaIfAny(spark).isEmpty, "compact left the delta")
    assert(st.postingsTable.exists(spark.catalog.tableExists),
      "compact did not re-register the bucketed base")
    assertFrameEqual(TextIndexStore.bm25(spark, st, terms),
      TextIndexStore.bm25(spark, idx, terms), "post-compact bm25")
    val nodes = planNodes(st.postings(spark)
      .groupBy("token").agg(count(lit(1)).as("df")))
    assert(!nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      "compact did not restore the zero-exchange token aggregation")
  }

  test("bucketed compact commits the folded base AND the cleared " +
      "delta in ONE flip: no crash state can double-count — a " +
      "pre-flip crash keeps base ∪ delta serving exactly; the " +
      "committed flip swaps to folded-base-only atomically") {
    val dir = s"$tmp/bucketed-crash"
    val st = TextIndexStore.build(docs.filter(col("doc_id") < 300),
      "doc_id", "text", dir, bucketPostings = 4)
    TextIndexStore.update(st,
      docs.filter(col("doc_id") >= 300 && col("doc_id") < 400), "text")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val deltaFiles = stageFiles(dir, "postings_delta")
    assert(deltaFiles.nonEmpty)
    val baseCount = st.postings(spark).count()
    val preManifest = StoreVersions.read(fs, dir)
    // fabricate a compact that died BEFORE its flip: the folded base
    // and the empty delta are fully staged as next versions, the
    // `.swap` marker survives — under the old two-commit protocol
    // this was the double-count window (committed base + live delta)
    UpdateMarker.write(fs, UpdateMarker.markerPath(dir),
      UpdateMarker.State("", Map(
        "postings.swap" -> stageFiles(dir, "postings"),
        "doclens.swap" -> stageFiles(dir, "doclens"))))
    st.postings(spark).write
      .parquet(StoreVersions.next(fs, dir, "postings"))
    StoreVersions.nextEmpty(fs, dir, "postings_delta")
    // crash here: the manifest never moved, so base ∪ delta still
    // serves exactly — no row appears twice and none is lost
    assert(StoreVersions.read(fs, dir) == preManifest,
      "staging moved the manifest before the flip")
    TextIndexStore.update(st, docs.limit(0), "text")
    assert(deltaFiles.subsetOf(stageFiles(dir, "postings_delta")),
      "pre-flip crash settlement destroyed the delta")
    assert(st.postings(spark).count() == baseCount,
      "pre-flip crash changed the served postings")
    // a REAL compact then commits folded base + emptied delta in one
    // flip: same rows, delta gone — atomically, so no reader
    // ordering can ever see both the fold and the delta
    TextIndexStore.compact(spark, st)
    assert(st.deltaIfAny(spark).isEmpty, "compact left the delta")
    assert(st.postings(spark).count() == baseCount,
      "the atomic fold changed the served postings")
  }

  test("delete serves exactly (== rebuild without the docs) BEFORE " +
      "compact; delete-then-compact == rebuild physically; re-add " +
      "guarded; replay a no-op") {
    val dir = s"$tmp/del"
    val doomed = docs.filter(col("doc_id") % 7 === 3)
    val st = TextIndexStore.build(docs, "doc_id", "text", dir)
    TextIndexStore.delete(st, doomed.select("doc_id"), Some("d1"))
    val without = TextIndexStore.build(
      docs.filter(col("doc_id") % 7 =!= 3), "doc_id", "text",
      s"$tmp/del-rebuild")
    // BEFORE any rewrite: masked reads + exactly-decremented
    // counters == the rebuild, bit for bit
    assert(st.stats(spark).collect().toSeq ==
      without.stats(spark).collect().toSeq, "counters not exact")
    assertFrameEqual(st.postings(spark), without.postings(spark),
      "masked postings")
    assertFrameEqual(st.doclens(spark), without.doclens(spark),
      "masked doclens")
    assertFrameEqual(TextIndexStore.bm25(spark, st, terms),
      TextIndexStore.bm25(spark, without, terms), "served scores")
    // deleting the same ids again (keyless) decrements nothing —
    // only live ids count
    TextIndexStore.delete(st, doomed.select("doc_id"))
    assert(st.stats(spark).collect().toSeq ==
      without.stats(spark).collect().toSeq, "double-decrement")
    // a batchId replay is a detected no-op
    TextIndexStore.delete(st, doomed.select("doc_id"), Some("d1"))
    assert(st.stats(spark).collect().toSeq ==
      without.stats(spark).collect().toSeq)
    // re-adding a tombstoned id fails loudly until compact
    val e = intercept[IllegalArgumentException] {
      TextIndexStore.update(st, doomed.limit(3), "text")
    }
    assert(e.getMessage.contains("tombstoned"))
    // compact makes the removal physical and clears the tombstones
    TextIndexStore.compact(spark, st)
    assert(st.tombstonesIfAny(spark).isEmpty, "tombstones survived")
    assertFrameEqual(st.postings(spark), without.postings(spark),
      "physical postings")
    assertFrameEqual(TextIndexStore.bm25(spark, st, terms),
      TextIndexStore.bm25(spark, without, terms), "post-compact scores")
    // the id is free again: re-add restores the full corpus exactly
    TextIndexStore.update(st, doomed, "text")
    val full = TextIndexStore.build(docs, "doc_id", "text",
      s"$tmp/del-full")
    assert(st.stats(spark).collect().toSeq ==
      full.stats(spark).collect().toSeq)
    assertFrameEqual(TextIndexStore.bm25(spark, st, terms),
      TextIndexStore.bm25(spark, full, terms), "re-added scores")
  }

  test("delete on a BUCKETED store: serving stays exact with the " +
      "delta outstanding, compact folds delta AND removals together") {
    val dir = s"$tmp/del-bucketed"
    val st = TextIndexStore.build(docs.filter(col("doc_id") % 3 =!= 0),
      "doc_id", "text", dir, bucketPostings = 8)
    TextIndexStore.update(st, docs.filter(col("doc_id") % 3 === 0),
      "text")
    TextIndexStore.delete(st,
      docs.filter(col("doc_id") % 7 === 3).select("doc_id"))
    val without = TextIndexStore.build(
      docs.filter(col("doc_id") % 7 =!= 3), "doc_id", "text",
      s"$tmp/del-bucketed-rebuild")
    assert(st.stats(spark).collect().toSeq ==
      without.stats(spark).collect().toSeq)
    assertFrameEqual(TextIndexStore.bm25(spark, st, terms),
      TextIndexStore.bm25(spark, without, terms),
      "bucketed delete serving")
    TextIndexStore.compact(spark, st)
    assert(st.deltaIfAny(spark).isEmpty &&
      st.tombstonesIfAny(spark).isEmpty)
    assertFrameEqual(st.postings(spark), without.postings(spark),
      "bucketed post-compact postings")
  }

  test("bm25Filtered: frozen corpus-wide idf — allowed docs score " +
      "bit-identically to the unfiltered serve, UNLIKE a subcorpus " +
      "rebuild; degenerate allow == bm25; deletes still mask") {
    val allowed = docs.filter(col("doc_id") % 3 === 0).select("doc_id")
    val res = TextIndexStore.bm25Filtered(spark, idx, terms, allowed)
    // per-document independence + frozen models: the filtered serve
    // IS the unfiltered serve restricted to allowed ids
    assertFrameEqual(res,
      TextIndexStore.bm25(spark, idx, terms)
        .join(allowed, Seq("doc_id"), "left_semi"),
      "filtered vs post-filtered scores")
    assert(res.count() > 0, "fixture too easy: no allowed doc scored")
    // fixture strength for 'frozen': a store REBUILT over just the
    // allowed subcorpus shifts n/avgdl/idf and must score differently
    val sub = TextIndexStore.build(
      docs.filter(col("doc_id") % 3 === 0), "doc_id", "text",
      s"$tmp/allowed-sub")
    val drift = TextIndexStore.bm25(spark, sub, terms)
      .withColumnRenamed("score", "sub_score")
      .join(res, "doc_id")
      .filter(col("sub_score") =!= col("score"))
    assert(drift.count() > 0,
      "fixture too easy: subcorpus stats happen to match corpus-wide")
    // degenerate allow-list (every doc) is exactly bm25()
    assertFrameEqual(
      TextIndexStore.bm25Filtered(spark, idx, terms,
        docs.select("doc_id")),
      TextIndexStore.bm25(spark, idx, terms),
      "bm25Filtered(all ids) vs bm25")
    // deletion composes: a tombstoned doc never scores even if allowed
    val st = TextIndexStore.build(docs, "doc_id", "text",
      s"$tmp/filtered-del")
    val doomed = res.select("doc_id").limit(3)
    val doomedIds = doomed.collect().map(_.getLong(0)).toSet
    TextIndexStore.delete(st, doomed)
    val masked = TextIndexStore.bm25Filtered(spark, st, terms, allowed)
    assert(masked.filter(col("doc_id").isin(doomedIds.toSeq: _*)).isEmpty,
      "a deleted-but-allowed doc scored")
  }

  test("matchAll: conjunctive semantics from the postings — equals " +
      "the from-corpus expectation, partial matches excluded") {
    val res = TextIndexStore.matchAll(spark, idx, terms)
    val tok = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("token"))
      .filter(col("token").isin(terms: _*))
    val expected = tok.groupBy("doc_id")
      .agg(count(lit(1)).as("tf_sum"),
        countDistinct("token").as("_nt"))
      .filter(col("_nt") === terms.size)
      .select(col("doc_id"), col("tf_sum"))
    assertFrameEqual(res, expected, "matchAll vs from-corpus")
    // fixture strength: the AND is doing work — some docs match a
    // strict subset of the terms and must be excluded
    val anyMatch = tok.select("doc_id").distinct().count()
    assert(res.count() > 0, "fixture too easy: no doc matches all terms")
    assert(res.count() < anyMatch,
      "fixture too easy: every any-term doc matches all terms")
  }

  test("phraseMatch: consecutive-token semantics from the stored " +
      "positions — equals the from-corpus expectation, the bigram " +
      "prefix matches strictly more docs, duplicate-term phrases " +
      "and deletes compose") {
    val phrase = Seq("small", "query", "line")
    val res = TextIndexStore.phraseMatch(spark, idx, phrase)
    // from-corpus expectation via the same slot-shift formulation
    // over a fresh tokenize (the store must agree with raw text)
    val tp = docs.select(col("doc_id"),
      posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "token")))
    val slots = phrase.zipWithIndex.map { case (t, i) =>
      tp.filter(col("token") === t)
        .select(col("doc_id"), (col("pos") - i).as("start"))
    }
    val expected = slots.reduce(_.join(_, Seq("doc_id", "start")))
      .groupBy("doc_id").agg(count(lit(1)).as("hits"))
    assertFrameEqual(res, expected, "phraseMatch vs from-corpus")
    assert(res.count() > 0, "fixture too easy: phrase absent")
    // the phrase is doing work beyond a boolean AND: its bigram
    // prefix matches strictly more docs
    val bigram = TextIndexStore.phraseMatch(spark, idx,
      phrase.take(2))
    assert(bigram.count() > res.count(),
      "fixture too easy: bigram docs == trigram docs")
    // duplicate-term phrase: same postings row feeds both slots
    import spark.implicits._
    val d = Seq((1L, "go batch batch stop"), (2L, "go batch stop"))
      .toDF("doc_id", "text")
    val st = TextIndexStore.build(d, "doc_id", "text", s"$tmp/phrase")
    val dup = TextIndexStore.phraseMatch(spark, st,
        Seq("batch", "batch"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dup == Map(1L -> 1L), s"duplicate-term phrase: $dup")
    // deletion composes: a tombstoned doc never matches
    val doomed = res.select("doc_id").limit(1)
    val doomedId = doomed.head().getLong(0)
    val st2 = TextIndexStore.build(docs, "doc_id", "text",
      s"$tmp/phrase-del")
    TextIndexStore.delete(st2, doomed)
    assert(TextIndexStore.phraseMatch(spark, st2, phrase)
      .filter(col("doc_id") === doomedId).isEmpty,
      "a deleted doc phrase-matched")
  }

  test("proximityMatch: slop = 1 IS the exact phrase; a wider slop " +
      "admits strictly more docs; equals the from-corpus expectation") {
    val phrase = Seq("small", "query", "line")
    assertFrameEqual(
      TextIndexStore.proximityMatch(spark, idx, phrase, slop = 1),
      TextIndexStore.phraseMatch(spark, idx, phrase),
      "proximity(slop=1) vs phrase")
    val loose = TextIndexStore.proximityMatch(spark, idx, phrase,
      slop = 3)
    assert(loose.count() >
        TextIndexStore.phraseMatch(spark, idx, phrase).count(),
      "fixture too easy: slop admitted nothing new")
    // from-corpus expectation via the same chain over a fresh
    // tokenize
    val tp = docs.select(col("doc_id"),
      posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "token")))
    val slots = phrase.zipWithIndex.map { case (t, i) =>
      tp.filter(col("token") === t)
        .select(col("doc_id"), col("pos").as(s"_p$i"))
    }
    val expected = slots.zipWithIndex.tail
      .foldLeft(slots.head) { case (acc, (slot, i)) =>
        acc.join(slot, Seq("doc_id"))
          .filter((col(s"_p$i") - col(s"_p${i - 1}")).between(1, 3))
      }
      .groupBy("doc_id").agg(count(lit(1)).as("hits"))
    assertFrameEqual(loose, expected, "proximity vs from-corpus")
  }

  test("matchAtLeast: m = |terms| IS matchAll, m = 1 IS the OR, the " +
      "quorum shrinks monotonically in m, and the middle tier does " +
      "observable work") {
    val ts = Seq("join", "vector", "stream")
    assertFrameEqual(
      TextIndexStore.matchAtLeast(spark, idx, ts, m = 3)
        .select("doc_id", "tf_sum"),
      TextIndexStore.matchAll(spark, idx, ts),
      "quorum(m=n) vs matchAll")
    // m = 1 is the union of per-term postings docs (boolean OR)
    val orDocs = idx.postings(spark)
      .filter(col("token").isin(ts: _*))
      .select("doc_id").distinct()
    assertFrameEqual(
      TextIndexStore.matchAtLeast(spark, idx, ts, m = 1)
        .select("doc_id"),
      orDocs, "quorum(m=1) vs OR")
    val c1 = TextIndexStore.matchAtLeast(spark, idx, ts, 1).count()
    val c2 = TextIndexStore.matchAtLeast(spark, idx, ts, 2).count()
    val c3 = TextIndexStore.matchAtLeast(spark, idx, ts, 3).count()
    assert(c1 >= c2 && c2 >= c3, "quorum not monotone in m")
    assert(c1 > c2 && c2 > c3,
      "fixture too easy: every tier equal — terms co-occur everywhere")
  }

  test("proximityWindow: unordered = both orders for two terms " +
      "(hits equality per doc), contains the ordered chain for " +
      "three, and admits reversed mentions the ordered chain cannot") {
    val w = 6
    // two-term law: |pa − pb| <= w  ⟺  ordered a→b or b→a with the
    // same bound — hit counts must agree doc-for-doc, not just rows
    val ab = TextIndexStore.proximityMatch(spark, idx,
      Seq("small", "query"), slop = w)
      .select(col("doc_id"), col("hits").as("h1"))
    val ba = TextIndexStore.proximityMatch(spark, idx,
      Seq("query", "small"), slop = w)
      .select(col("doc_id"), col("hits").as("h2"))
    val both = ab.join(ba, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(col("h1"), lit(0L)) + coalesce(col("h2"), lit(0L)))
          .as("hits"))
    assertFrameEqual(
      TextIndexStore.proximityWindow(spark, idx,
        Seq("small", "query"), window = w),
      both, "window vs sum of both orders")
    // three-term containment: an ordered slop-w chain spans <= 2w,
    // so its docs are a subset of window(2w); and the fixture must
    // show the unordered form matching docs the ordered one cannot
    val terms = Seq("small", "query", "line")
    val ordered = TextIndexStore.proximityMatch(spark, idx, terms,
      slop = w).select("doc_id")
    val window = TextIndexStore.proximityWindow(spark, idx, terms,
      window = 2 * w).select("doc_id")
    assert(ordered.exceptAll(window).isEmpty,
      "ordered chain found a doc outside the covering window")
    assert(window.exceptAll(ordered).count() > 0,
      "fixture too easy: no reversed-order mentions in the corpus")
  }

  test("bm25TopK == brute-force top-k EXACTLY (rows, scores, tie " +
      "order) — on the plain corpus, with a planted stopword, " +
      "through update/delete/compact — and the pruning is real: " +
      "the stopword stays non-essential and blocks are skipped") {
    // plant a stopword: every doc carries it, so its postings are
    // corpus-scale and its idf (hence ub) is tiny — exactly the
    // serve the verdict's scenario describes
    val planted = docs.withColumn("text",
      concat(col("text"), lit(" the the the")))
    val qterms = Seq("the", "join", "vector")
    val k = 20
    val st = TextIndexStore.build(planted, "doc_id", "text",
      s"$tmp/topk")
    def brute(ix: TextIndexStore.Index, ts: Seq[String], kk: Int) =
      TextIndexStore.bm25(spark, ix, ts)
        .orderBy(col("score").desc, col("doc_id").asc).limit(kk)
        .collect().toSeq
    def pruned(ix: TextIndexStore.Index, ts: Seq[String], kk: Int) =
      TextIndexStore.bm25TopK(spark, ix, ts, kk).collect().toSeq
    assert(pruned(st, qterms, k) == brute(st, qterms, k),
      "planted-stopword top-k diverged from brute force")
    // the pruning decision on a DETERMINISTIC multi-file fixture:
    // a high-impact head (vector ×8, short docs) built first, then
    // two low-impact update batches (vector ×1 inside long docs) —
    // their files' per-file bounds cannot reach the head's θ, so
    // block-max must skip them; the stopword in every doc must stay
    // non-essential
    import spark.implicits._
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    def doc(id: Long, body: String) = (id, s"the the the $body")
    val head = (1L to 50L).map(doc(_, "vector " * 8))
    // a large vector-free population keeps df(vector) rare (a real
    // idf) while "the" spans every doc (a true stopword)
    val pad = (1000L to 1799L).map(doc(_, filler))
    val tail1 = (51L to 150L).map(doc(_, s"$filler vector"))
    val tail2 = (151L to 250L).map(doc(_, s"$filler vector"))
    val fx = TextIndexStore.build((head ++ pad).toDF("doc_id", "text"),
      "doc_id", "text", s"$tmp/topk-blocks")
    TextIndexStore.update(fx, tail1.toDF("doc_id", "text"), "text")
    TextIndexStore.update(fx, tail2.toDF("doc_id", "text"), "text")
    val fxTerms = Seq("the", "vector")
    val fxK = 10
    assert(pruned(fx, fxTerms, fxK) == brute(fx, fxTerms, fxK),
      "fixture top-k diverged from brute force")
    val snap = fx.pin(spark)
    val statsF = snap.stats(spark).select(col("n").as("_n"),
      (col("sumdl") / col("n")).as("_avgdl"))
    val metaRows = spark.read.parquet(snap.metaPath)
      .filter(col("token").isin(fxTerms: _*)).collect()
    val idfF = TextOps.bm25Idf(
      snap.postings(spark).filter(col("token").isin(fxTerms: _*))
        .select(col("doc_id"), col("token"), col("tf")), statsF)
    val d = TextIndexStore.decisionOf(spark, snap, idfF, metaRows,
      fxTerms, fxK, 1.2, 0.75,
      statsF.head().getDouble(1)).getOrElse(fail("no decision"))
    assert(!d.essential.contains("the"),
      s"the stopword became essential (${d.essential})")
    assert(d.allowedFiles.nonEmpty &&
      d.allowedFiles.size < d.probedFiles,
      s"block-skip excluded nothing " +
        s"(${d.allowedFiles.size} of ${d.probedFiles} files allowed)")
    // the candidate-generation scan reads strictly fewer postings
    // rows than the full probe (the stopword's rows and the skipped
    // blocks' rows are absent)
    val candRows = spark.read.parquet(d.allowedFiles: _*)
      .filter(col("token").isin(d.essential: _*)).count()
    val probeRows = snap.postings(spark)
      .filter(col("token").isin(fxTerms: _*)).count()
    assert(candRows < probeRows / 2,
      s"candidate scan ($candRows rows) did not shrink vs the full " +
        s"probe ($probeRows rows)")
    // exactness holds through the maintenance lifecycle: update
    // (delta outstanding on the plain layout's appends), delete
    // (tombstones outstanding — the idf scan fallback arm), compact
    val st2 = TextIndexStore.build(
      planted.filter(col("doc_id") % 5 =!= 4), "doc_id", "text",
      s"$tmp/topk-maint")
    TextIndexStore.update(st2, planted.filter(col("doc_id") % 5 === 4),
      "text")
    assert(pruned(st2, qterms, k) == brute(st2, qterms, k),
      "top-k diverged after update")
    TextIndexStore.delete(st2,
      planted.filter(col("doc_id") % 7 === 3).select("doc_id"))
    assert(pruned(st2, qterms, k) == brute(st2, qterms, k),
      "top-k diverged with tombstones outstanding")
    TextIndexStore.compact(spark, st2)
    assert(pruned(st2, qterms, k) == brute(st2, qterms, k),
      "top-k diverged after compact")
    // degenerate shapes: single term; k beyond the match count
    assert(pruned(st, Seq("vector"), 5) == brute(st, Seq("vector"), 5))
    assert(pruned(st, Seq("vector", "join"), 100000) ==
      brute(st, Seq("vector", "join"), 100000),
      "k past the match count must serve the full ranked list")
  }

  test("bm25TopKFiltered == bm25Filtered's ordered top-k EXACTLY; " +
      "scores stay corpus-wide under the mask; θ comes from ALLOWED " +
      "docs only (an unallowed top scorer must not inflate it and " +
      "starve the filtered top-k); the block-skip survives the mask") {
    import spark.implicits._
    val planted = docs.withColumn("text",
      concat(col("text"), lit(" the the the")))
    val qterms = Seq("the", "join", "vector")
    val k = 20
    val st = TextIndexStore.build(planted, "doc_id", "text",
      s"$tmp/topk-filt")
    def brute(allowed: org.apache.spark.sql.DataFrame, kk: Int) =
      TextIndexStore.bm25Filtered(spark, st, qterms, allowed)
        .orderBy(col("score").desc, col("doc_id").asc).limit(kk)
        .collect().toSeq
    def pruned(allowed: org.apache.spark.sql.DataFrame, kk: Int) =
      TextIndexStore.bm25TopKFiltered(spark, st, qterms, allowed, kk)
        .collect().toSeq
    val allowed = planted.filter(col("doc_id") % 3 === 0)
      .select("doc_id")
    assert(pruned(allowed, k) == brute(allowed, k),
      "filtered top-k diverged from the brute-force filtered chain")
    // frozen-models contract: every filtered row's score equals its
    // UNFILTERED bm25 score bit-for-bit (the mask never touches the
    // model)
    val filt = TextIndexStore.bm25TopKFiltered(spark, st, qterms,
      allowed, k).select(col("doc_id"), col("score").as("_f"))
    val unfiltered = TextIndexStore.bm25(spark, st, qterms)
    assert(filt.join(unfiltered, "doc_id")
        .filter(col("_f") =!= col("score")).isEmpty,
      "a masked doc's score drifted from its unfiltered value")
    // the θ-inflation adversarial case: allow ONLY documents OUTSIDE
    // the unfiltered top-k — a θ computed over the whole corpus would
    // sit above every allowed doc's score and prune the answer away
    val lowOnly = planted.select("doc_id").exceptAll(
      TextIndexStore.bm25TopK(spark, st, qterms, k).select("doc_id"))
    assert(pruned(lowOnly, k) == brute(lowOnly, k),
      "θ leaked from unallowed docs: the low-score slice was starved")
    assert(pruned(lowOnly, k).size == k,
      "the low-score slice has >= k matches; the serve returned fewer")
    // degenerate shapes: an empty mask serves empty; a mask smaller
    // than k serves exactly its matching members
    assert(pruned(planted.filter(col("doc_id") < 0).select("doc_id"),
      k).isEmpty, "empty allow-list must serve empty")
    val tiny = planted.filter(col("doc_id") % 97 === 0).select("doc_id")
    assert(pruned(tiny, 100000) == brute(tiny, 100000),
      "k past the allowed match count must serve the full ranked list")
    // the pruning stays REAL under the mask: on the deterministic
    // multi-file fixture (high-impact head + low-impact update
    // batches), the masked decision still keeps the stopword
    // non-essential and still excludes the low-bound blocks
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    def doc(id: Long, body: String) = (id, s"the the the $body")
    val head = (1L to 50L).map(doc(_, "vector " * 8))
    val pad = (1000L to 1799L).map(doc(_, filler))
    val tail1 = (51L to 150L).map(doc(_, s"$filler vector"))
    val tail2 = (151L to 250L).map(doc(_, s"$filler vector"))
    val fx = TextIndexStore.build((head ++ pad).toDF("doc_id", "text"),
      "doc_id", "text", s"$tmp/topk-filt-blocks")
    TextIndexStore.update(fx, tail1.toDF("doc_id", "text"), "text")
    TextIndexStore.update(fx, tail2.toDF("doc_id", "text"), "text")
    val fxTerms = Seq("the", "vector")
    val fxAllowed = (head ++ pad ++ tail1 ++ tail2)
      .map(_._1).filter(_ % 2 == 0).toDF("doc_id")
    assert(
      TextIndexStore.bm25TopKFiltered(spark, fx, fxTerms, fxAllowed, 10)
        .collect().toSeq ==
      TextIndexStore.bm25Filtered(spark, fx, fxTerms, fxAllowed)
        .orderBy(col("score").desc, col("doc_id").asc).limit(10)
        .collect().toSeq,
      "fixture filtered top-k diverged from brute force")
    val snap = fx.pin(spark)
    val statsF = snap.stats(spark).select(col("n").as("_n"),
      (col("sumdl") / col("n")).as("_avgdl"))
    val metaRows = spark.read.parquet(snap.metaPath)
      .filter(col("token").isin(fxTerms: _*)).collect()
    val idfF = TextOps.bm25Idf(
      snap.postings(spark).filter(col("token").isin(fxTerms: _*))
        .select(col("doc_id"), col("token"), col("tf")), statsF)
    val d = TextIndexStore.decisionOf(spark, snap, idfF, metaRows,
      fxTerms, 10, 1.2, 0.75, statsF.head().getDouble(1),
      df => df.join(fxAllowed, Seq("doc_id"), "left_semi"))
      .getOrElse(fail("no masked decision"))
    assert(!d.essential.contains("the"),
      s"the stopword became essential under the mask (${d.essential})")
    assert(d.allowedFiles.nonEmpty &&
      d.allowedFiles.size < d.probedFiles,
      s"masked block-skip excluded nothing " +
        s"(${d.allowedFiles.size} of ${d.probedFiles} files allowed)")
  }

  test("the term probe pushes into the postings scan") {
    val df = TextIndexStore.bm25(spark, idx, terms)
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def nodes(p: SparkPlan): Seq[SparkPlan] = (p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case s: QueryStageExec => s +: nodes(s.plan)
      case o => o +: o.children.flatMap(nodes)
    }) ++ p.subqueries.flatMap(nodes)
    val scan = nodes(df.queryExecution.executedPlan).collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("postings"))
        => s
    }.getOrElse(fail("no postings scan in the serving plan"))
    assert(scan.metadata.get("PushedFilters")
        .exists(f => f.contains("In(token") || f.contains("token#")),
      s"term probe not pushed: ${scan.metadata.get("PushedFilters")}")
    // the positional column is dead weight for SCORING and must be
    // pruned out of the scan — the "one int per occurrence" cost is
    // paid only by phrase/proximity reads
    assert(scan.metadata.get("ReadSchema")
        .exists(rs => !rs.contains("positions")),
      s"bm25 scan reads positions: ${scan.metadata.get("ReadSchema")}")
  }
}
