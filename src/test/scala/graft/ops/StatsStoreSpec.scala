package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The mergeable-sketch stats store: exact fields must be exact,
  * sketch estimates must sit inside their documented error bounds
  * against brute-force twins, and the update law — aggregate the
  * batch, union the sketches — must reproduce a from-scratch
  * rebuild (exactly for the additive fields and the HLL estimate,
  * within rank bounds for the randomized KLL).
  */
class StatsStoreSpec extends SparkSpec {

  private lazy val docs = sf("documents")

  private lazy val brute: Map[String, (Long, Long, Long, Seq[Long])] =
    docs.select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (src, rows) =>
        val texts = rows.map(_._2).toSeq
        val toks = texts.flatMap(_.split("\\s+").filter(_.nonEmpty))
        src -> (rows.length.toLong, toks.length.toLong,
          toks.distinct.length.toLong,
          texts.map(_.length.toLong).sorted)
      }

  private def tempStore(): String = java.nio.file.Files
    .createTempDirectory("stats-store").toString

  /** Exact rank of `v` in sorted `xs` (fraction ≤ v). */
  private def rankOf(xs: Seq[Long], v: Long): Double =
    xs.count(_ <= v).toDouble / xs.size

  private def collectReport(st: StatsStore.Store) =
    st.report(spark).collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).toMap

  private lazy val bruteFp: Map[String, Set[String]] =
    docs.select(col("source"),
        TextOps.fingerprint(col("text")).as("fp"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("build: exact fields exact, estimates inside their bounds") {
    val st = StatsStore.build(docs, "text", "source", tempStore())
    val rep = collectReport(st)
    assert(rep.keySet == brute.keySet)
    for ((src, (nDocs, nToks, nDistinct, lens)) <- brute) {
      val (d, t, est, fpEst, p50, p95) = rep(src)
      assert(d == nDocs && t == nToks, s"$src: exact fields")
      // HLL lgK=12 → ~1.6% relative error; 5% is the generous pin
      assert(math.abs(est - nDistinct) <= math.max(1, nDistinct / 20),
        s"$src: HLL estimate $est vs exact $nDistinct")
      // theta in EXACT mode at this cardinality: estimate IS the count
      assert(fpEst == bruteFp(src).size,
        s"$src: theta fp estimate $fpEst vs exact ${bruteFp(src).size}")
      // KLL k=200 → ~1.65% rank error; pin to generous rank windows
      assert(rankOf(lens, p50) >= 0.40 && rankOf(lens, p50 - 1) <= 0.60,
        s"$src: p50=$p50 rank ${rankOf(lens, p50)}")
      assert(rankOf(lens, p95) >= 0.90,
        s"$src: p95=$p95 rank ${rankOf(lens, p95)}")
    }
  }

  test("overlap matrix off stored sketches == brute-force fp intersections") {
    val st = StatsStore.build(docs, "text", "source", tempStore())
    val got = st.overlapMatrix(spark).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val srcs = bruteFp.keySet.toSeq.sorted
    val expected = (for {
      a <- srcs; b <- srcs if a < b
    } yield (a, b) -> bruteFp(a).intersect(bruteFp(b)).size.toLong).toMap
    assert(got == expected,
      s"diff: ${(got.toSet -- expected.toSet).take(5)} / " +
        s"${(expected.toSet -- got.toSet).take(5)}")
  }

  test("update(build(evens), odds) == rebuild, to each field's guarantee") {
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val odds = docs.filter(col("doc_id") % 2 === 1)
    val inc = StatsStore.update(
      StatsStore.build(evens, "text", "source", tempStore()),
      odds, "text", "source")
    val full = StatsStore.build(docs, "text", "source", tempStore())
    val ri = collectReport(inc)
    val rf = collectReport(full)
    assert(ri.keySet == rf.keySet)
    for (src <- rf.keySet) {
      val (di, ti, esti, fpi, p50i, p95i) = ri(src)
      val (df, tf, estf, fpf, _, _) = rf(src)
      assert(di == df && ti == tf, s"$src: additive fields must be EXACT")
      // HLL union is a register-wise max at one lgK: estimate equality
      // is the law, not an approximation
      assert(esti == estf, s"$src: HLL union estimate $esti != $estf")
      // theta union in exact mode is exact set union
      assert(fpi == fpf, s"$src: theta union estimate $fpi != $fpf")
      // KLL compaction is randomized: merged and rebuilt sketches are
      // equivalent in guarantee, so bound BOTH against exact ranks
      val lens = brute(src)._4
      assert(rankOf(lens, p50i) >= 0.40 && rankOf(lens, p50i - 1) <= 0.60,
        s"$src: merged p50=$p50i rank ${rankOf(lens, p50i)}")
      assert(rankOf(lens, p95i) >= 0.90,
        s"$src: merged p95=$p95i rank ${rankOf(lens, p95i)}")
    }
  }

  test("token-less sources: zero counters both paths, so the law holds") {
    // a source whose every text is whitespace must get counter 0 (not
    // null) from BOTH a direct build and the additive update merge —
    // the divergence that would silently break update == rebuild
    import spark.implicits._
    def mk(rows: (Long, String, String)*) =
      rows.toSeq.toDF("doc_id", "text", "source")
    val hist = mk((1L, "alpha beta", "s_tok"), (2L, "  ", "s_empty"))
    val batch = mk((3L, "", "s_empty"), (4L, "gamma", "s_tok"))
    val inc = StatsStore.update(
      StatsStore.build(hist, "text", "source", tempStore()),
      batch, "text", "source")
    val full = StatsStore.build(hist.unionByName(batch),
      "text", "source", tempStore())
    def counters(st: StatsStore.Store) =
      st.stats(spark).select("source", "docs", "token_occurrences")
        .collect().map(r =>
          r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ci = counters(inc)
    assert(ci == counters(full), "update and rebuild counters differ")
    assert(ci("s_empty") == (2L, 0L))
    // the readout must not throw on the token-less source either
    assert(inc.report(spark).filter(col("source") === "s_empty")
      .count() == 1)
  }

  test("theta ESTIMATE mode: overlap tolerance + update law past 2^12") {
    // Every committed overlap check runs theta in exact mode (θ = 1,
    // estimates are exact integers — the q128 oracle's precondition).
    // This fixture pushes every source past k = 2^ThetaLgNom = 4096
    // distinct fingerprints, where θ < 1 and the documented
    // ~1/√(k−1) ≈ 1.6% RSE takes over — the "degrades gracefully"
    // claim in the ThetaLgNom scaladoc, as a spec instead of prose.
    // Intersection error scales with the SET sizes (not the overlap),
    // so the bound is 5·RSE·max(|A|,|B|) — wide enough for the
    // order-dependent retention of distributed theta aggregation,
    // tight enough that a broken intersection (0, or |A|) fails.
    val n = 12000L // 3× past the exact-mode cliff
    def src(name: String, lo: Long, hi: Long) =
      spark.range(lo, hi).select(col("id").as("doc_id"),
        concat(lit("doc "), col("id"), lit(" payload")).as("text"),
        lit(name).as("source"))
    // A = [0, 12k), B = [6k, 18k), C = [12k, 24k): A∩B = B∩C = 6k,
    // A∩C = 0 — distinct texts ⇒ distinct md5 fingerprints
    val corpus = src("sa", 0, n).unionByName(src("sb", n / 2, 3 * n / 2))
      .unionByName(src("sc", n, 2 * n))
    val rse = 1.0 / math.sqrt((1 << 12) - 1)
    val tol = math.ceil(5 * rse * n).toLong

    val st = StatsStore.build(corpus, "text", "source", tempStore())
    // θ really is < 1: a sketch at or under k entries would make this
    // whole test silently exact-mode again
    val ests = st.report(spark).select("source", "distinct_fp_est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((s, est) <- ests)
      assert(math.abs(est - n) <= tol, s"$s: fp est $est vs true $n")

    val got = st.overlapMatrix(spark).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val truth = Map(("sa", "sb") -> n / 2, ("sb", "sc") -> n / 2,
      ("sa", "sc") -> 0L)
    assert(got.keySet == truth.keySet)
    for ((pair, t) <- truth)
      assert(math.abs(got(pair) - t) <= tol,
        s"$pair: overlap est ${got(pair)} vs true $t (tol $tol)")

    // update law in estimate mode: union-of-sketches and direct build
    // are BOTH within the estimate guarantee of the truth (unlike
    // HLL's register-max identity, theta union may trim θ differently
    // than a direct build, so equality is not the law here — the
    // shared bound is)
    val inc = StatsStore.update(
      StatsStore.build(corpus.filter(col("doc_id") % 2 === 0),
        "text", "source", tempStore()),
      corpus.filter(col("doc_id") % 2 === 1), "text", "source")
    val incEsts = inc.report(spark).select("source", "distinct_fp_est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((s, est) <- incEsts)
      assert(math.abs(est - n) <= tol,
        s"$s: merged fp est $est vs true $n")
    val gotInc = inc.overlapMatrix(spark).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for ((pair, t) <- truth)
      assert(math.abs(gotInc(pair) - t) <= tol,
        s"$pair: merged overlap est ${gotInc(pair)} vs true $t")

    // driftReport novelty (theta a-not-b) degrades on the same terms:
    // old = first half of each source's id range, so exactly n/2
    // fingerprints are novel per source
    val oldSt = StatsStore.build(
      corpus.filter(col("doc_id") % 2 === 0), "text", "source",
      tempStore())
    val novel = StatsStore.driftReport(spark, oldSt, st)
      .select("source", "novel_fp")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((s, got) <- novel)
      assert(math.abs(got - n / 2) <= tol,
        s"$s: novelty est $got vs true ${n / 2} (tol $tol)")
  }

  test("driftReport: exact counter deltas, novelty = theta a-not-b (exact mode)") {
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val oldSt = StatsStore.build(evens, "text", "source", tempStore())
    val newSt = StatsStore.build(docs, "text", "source", tempStore())
    val got = StatsStore.driftReport(spark, oldSt, newSt).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getDouble(7))).toMap
    val oldFp = evens.select(col("source"),
        TextOps.fingerprint(col("text")).as("fp"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val oldCounts = evens.select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(rows => (rows.length.toLong,
        rows.map(_._2.split("\\s+").count(_.nonEmpty).toLong).sum)).toMap
    assert(got.keySet == brute.keySet)
    for ((src, (nDocs, nToks, _, _)) <- brute) {
      val (dOld, dNew, tOld, tNew, novel, distinct, rate) = got(src)
      val (eDocs, eToks) = oldCounts.getOrElse(src, (0L, 0L))
      assert(dOld == eDocs && dNew == nDocs, s"$src: doc counters")
      assert(tOld == eToks && tNew == nToks, s"$src: token counters")
      // theta difference in exact mode IS the set difference
      val expectNovel =
        (bruteFp(src) -- oldFp.getOrElse(src, Set.empty)).size.toLong
      assert(novel == expectNovel && distinct == bruteFp(src).size,
        s"$src: novel $novel vs $expectNovel, distinct $distinct")
      assert(math.abs(rate -
        math.rint(1e4 * expectNovel.toDouble / distinct) / 1e4) < 1e-9,
        s"$src: novelty rate $rate")
    }
  }

  test("driftReport: brand-new source has zero history and full novelty") {
    import spark.implicits._
    val hist = Seq((1L, "alpha beta", "s_a"))
      .toDF("doc_id", "text", "source")
    val batch = Seq((2L, "gamma delta", "s_b"), (3L, "alpha beta", "s_a"))
      .toDF("doc_id", "text", "source")
    val oldSt = StatsStore.build(hist, "text", "source", tempStore())
    val newSt = StatsStore.build(hist.unionByName(batch),
      "text", "source", tempStore())
    val got = StatsStore.driftReport(spark, oldSt, newSt).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(5),
        r.getDouble(7))).toMap
    // s_b never existed: docs_old 0, every fingerprint novel
    assert(got("s_b") == ((0L, 1L, 1.0)))
    // s_a re-sent an exact dup: nothing novel
    assert(got("s_a") == ((1L, 0L, 0.0)))
  }

  test("driftReport: a null source matches its own history (null-safe join)") {
    // same reason update() merges with <=>: a null source is a legal
    // (if unwelcome) group — plain equality would page it as a
    // brand-new source every single day
    import spark.implicits._
    val hist = Seq((1L, "alpha beta", Option.empty[String]),
        (2L, "gamma", Option("s_a")))
      .toDF("doc_id", "text", "source")
    val batch = Seq((3L, "alpha beta", Option.empty[String]))
      .toDF("doc_id", "text", "source")
    val oldSt = StatsStore.build(hist, "text", "source", tempStore())
    val newSt = StatsStore.build(hist.unionByName(batch),
      "text", "source", tempStore())
    val row = StatsStore.driftReport(spark, oldSt, newSt)
      .filter(col("source").isNull).collect()
    assert(row.length == 1)
    // docs_old 1 (the null group existed), nothing novel (exact dup)
    assert(row.head.getLong(1) == 1L && row.head.getLong(5) == 0L,
      s"null-source row: ${row.head}")
  }

  test("driftReport companion: a planted length shift moves the stored KLL p95") {
    import spark.implicits._
    def mk(lo: Long, hi: Long, len: Int) =
      spark.range(lo, hi).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until len).map(i =>
          concat(lit(s"w$i"), col("id"))): _*).as("text"),
        lit("s_shift").as("source"))
    val short = mk(0, 400, 5)
    val st = StatsStore.build(short, "text", "source", tempStore())
    val p95Before = st.report(spark).select("p95_len")
      .collect().head.getLong(0)
    // the batch is 10× longer docs — the extractor-regression shape a
    // drift monitor must surface from sketches alone
    StatsStore.update(st, mk(400, 600, 50), "text", "source")
    val p95After = st.report(spark).select("p95_len")
      .collect().head.getLong(0)
    assert(p95After > p95Before * 3,
      s"p95 $p95Before -> $p95After: shift not visible in KLL")
  }

  // ---- crash/re-run discipline (flip-last + UpdateMarker) ----------

  private def hfs(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  test("crashed update's staged version is swept; the re-run applies " +
      "the batch exactly once") {
    import spark.implicits._
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val odds = docs.filter(col("doc_id") % 2 === 1)
    val expected = collectReport(StatsStore.update(
      StatsStore.build(evens, "text", "source", tempStore()),
      odds, "text", "source"))

    // a crashed writer's ONLY possible uncommitted state under
    // flip-last: the in-flight marker plus a staged version dir
    // numbered above the manifest (the flip rename is atomic — the
    // old layout's two mid-swap states cannot exist). The re-run
    // must sweep the orphan and apply the batch exactly once.
    val dir = tempStore()
    val st = StatsStore.build(evens, "text", "source", dir)
    val fs = hfs(dir)
    UpdateMarker.write(fs, UpdateMarker.markerPath(dir),
      UpdateMarker.State("", Map("stats" -> UpdateMarker.listFiles(fs,
        StoreVersions.resolve(fs, dir, "stats")))))
    val orphan = StoreVersions.next(fs, dir, "stats")
    Seq(1).toDF("v").write.parquet(orphan)
    val orphanFiles = UpdateMarker.listFiles(fs, orphan)
    assert(collectReport(StatsStore.update(st, odds, "text", "source"))
      == expected, "re-run must sweep the orphan and apply once")
    // the sweep removed the crashed attempt's FILES; the version
    // NUMBER is legitimately reused by the re-run's own commit
    assert(orphanFiles.forall(f =>
        !fs.exists(new org.apache.hadoop.fs.Path(f))),
      "the crashed attempt's staged files must be swept")
  }

  test("committed-but-unacknowledged batch: same batchId re-run is a no-op") {
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val odds = docs.filter(col("doc_id") % 2 === 1)
    val dir = tempStore()
    val st = StatsStore.build(evens, "text", "source", dir)
    val fs = hfs(dir)
    val preListing = UpdateMarker.listFiles(fs,
      StoreVersions.resolve(fs, dir, "stats"))
    StatsStore.update(st, odds, "text", "source", Some("batch-7"))
    val expected = collectReport(st)
    // resurrect the marker as if the post-commit delete never ran
    UpdateMarker.write(fs, UpdateMarker.markerPath(dir),
      UpdateMarker.State("batch-7", Map("stats" -> preListing)))
    StatsStore.update(st, odds, "text", "source", Some("batch-7"))
    assert(collectReport(st) == expected,
      "a committed batch's re-run must not double-count")
    assert(!fs.exists(UpdateMarker.markerPath(dir)),
      "the detected no-op must clean the stale marker up")
    // a DIFFERENT batch after the stale marker still applies normally
    StatsStore.update(st, odds.limit(0), "text", "source", Some("batch-8"))
    assert(collectReport(st) == expected)
  }

  test("quiet day and new source: empty batch is a no-op, unseen source appends") {
    import spark.implicits._
    val st = StatsStore.build(docs, "text", "source", tempStore())
    val before = collectReport(st)
    StatsStore.update(st, docs.filter(lit(false)), "text", "source")
    assert(collectReport(st) == before, "empty batch must change nothing")
    StatsStore.update(st,
      Seq((90001L, "brand new source text here", "s_new"))
        .toDF("doc_id", "text", "source"),
      "text", "source")
    val after = collectReport(st)
    assert(after.keySet == before.keySet + "s_new")
    assert(after("s_new")._1 == 1L && after("s_new")._2 == 5L)
    assert(before.forall { case (k, v) => after(k) == v },
      "existing sources must be untouched by a disjoint-source batch")
  }

  test("driftReport: a source gone dark surfaces as a docs_new=0 row") {
    import spark.implicits._
    val oldDocs = Seq((1L, "alpha beta", "s_a"), (2L, "gamma", "s_gone"))
      .toDF("doc_id", "text", "source")
    val newDocs = Seq((1L, "alpha beta", "s_a"))
      .toDF("doc_id", "text", "source")
    val oldSt = StatsStore.build(oldDocs, "text", "source", tempStore())
    val newSt = StatsStore.build(newDocs, "text", "source", tempStore())
    val got = StatsStore.driftReport(spark, oldSt, newSt).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getDouble(7))).toMap
    // the monitor's most important row: history says 1 doc / 1 token,
    // the new snapshot has nothing — NOT a silent omission
    assert(got.contains("s_gone"), "vanished source must appear")
    assert(got("s_gone") == ((1L, 0L, 1L, 0L, 0L, 0L, 0.0)))
    assert(got("s_a")._2 == 1L)
  }

  test("replay after the marker's delete: _applied makes it a no-op") {
    // the window the in-flight marker alone cannot close: the update
    // returned (marker deleted) but the CALLER never acknowledged —
    // e.g. a foreachBatch crash before the checkpoint advanced — and
    // the producer re-sends the identical batch with the same id
    val evens = docs.filter(col("doc_id") % 2 === 0)
    val odds = docs.filter(col("doc_id") % 2 === 1)
    val dir = tempStore()
    val st = StatsStore.build(evens, "text", "source", dir)
    StatsStore.update(st, odds, "text", "source", Some("epoch-3"))
    val expected = collectReport(st)
    assert(!hfs(dir).exists(UpdateMarker.markerPath(dir)),
      "precondition: the committed update cleaned its marker up")
    StatsStore.update(st, odds, "text", "source", Some("epoch-3"))
    assert(collectReport(st) == expected,
      "the replayed batch must be a detected no-op, not a re-fold")
    // the NEXT batch id applies normally and takes over the record
    StatsStore.update(st, odds.limit(0), "text", "source",
      Some("epoch-4"))
    assert(UpdateMarker.readApplied(hfs(dir), dir) == Some("epoch-4"))
  }

  test("a rebuild clears the applied record (fresh epoch numbering)") {
    val dir = tempStore()
    val st = StatsStore.build(docs, "text", "source", dir)
    StatsStore.update(st, docs.limit(0), "text", "source", Some("0"))
    assert(UpdateMarker.readApplied(hfs(dir), dir) == Some("0"))
    // a fresh producer restarts its epochs at 0 — a stale record
    // would wrongly no-op its first real batch
    StatsStore.build(docs, "text", "source", dir)
    assert(UpdateMarker.readApplied(hfs(dir), dir).isEmpty)
  }

  test("an empty batchId is rejected (it aliases 'no key')") {
    val st = StatsStore.build(docs, "text", "source", tempStore())
    intercept[IllegalArgumentException] {
      StatsStore.update(st, docs.limit(0), "text", "source", Some(""))
    }
  }

  test("single-writer guard: a second in-flight marker fails loudly") {
    val dir = tempStore()
    val fs = hfs(dir)
    val marker = UpdateMarker.markerPath(dir)
    UpdateMarker.write(fs, marker,
      UpdateMarker.State("a", Map.empty))
    // a concurrent updater racing past the entry settle would land
    // here — it must error, not interleave with the first writer
    intercept[IllegalStateException] {
      UpdateMarker.write(fs, marker,
        UpdateMarker.State("b", Map.empty))
    }
    assert(UpdateMarker.read(fs, marker).get.batchId == "a",
      "the first writer's marker must survive the rejected second")
  }
}
