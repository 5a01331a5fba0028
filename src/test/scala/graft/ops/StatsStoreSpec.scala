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
}
