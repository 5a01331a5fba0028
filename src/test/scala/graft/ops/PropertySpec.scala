package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

/** Property-based pins over RANDOM inputs — the fixture specs prove
  * the operators on the corpus; these prove them on adversarial
  * shapes (ties, empty sides, single-key pileups) a fixed fixture
  * can't enumerate. Kept small (Spark round-trips per case are
  * expensive): few cases, wide generators.
  */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  /** Raw ScalaCheck runner (the scalatest bridge artifact isn't on
    * the offline classpath): few cases, Spark round-trips are slow.
    */
  private def checkProp(p: Prop, cases: Int = 5): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(cases), p)
    assert(res.passed, res.status.toString)
  }

  // events: (key, time, payload) with DENSE time range so exact ties
  // across sides and within sides are common
  private val evGen: Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(40, for {
      k <- Gen.choose(0L, 2L)
      t <- Gen.choose(0L, 9L)
      p <- Gen.choose(0L, 99L)
    } yield (k, t, p))

  test("asofJoin == per-row brute force under ties, both directions") {
    checkProp(Prop.forAllNoShrink(evGen, evGen) { (ls, rs) =>
      val left = ls.toDF("k", "t", "lp")
      val right = rs.toDF("k", "t", "rp")
      // backward: latest right with rt <= lt; ties on (k, t) carry
      // the LARGEST tiebreak; forward mirrors with smallest
      def brute(forward: Boolean): Map[(Long, Long, Long), Option[Long]] =
        ls.map { case (k, t, p) =>
          val cand = rs.filter(r => r._1 == k &&
            (if (forward) r._2 >= t else r._2 <= t))
          val pick =
            if (cand.isEmpty) None
            else if (forward)
              Some(cand.minBy(r => (r._2, r._3))._3)
            else Some(cand.maxBy(r => (r._2, r._3))._3)
          (k, t, p) -> pick
        }.toMap
      def run(forward: Boolean): Map[(Long, Long, Long), Option[Long]] = {
        val f = if (forward)
          AsOf.asofJoinForward(left, right, "k", "t", Seq(col("rp")))
        else AsOf.asofJoin(left, right, "k", "t", Seq(col("rp")))
        f.collect().map { r =>
          (r.getLong(0), r.getLong(1), r.getLong(2)) ->
            Option(r.get(3)).map(_.asInstanceOf[Long])
        }.toMap
      }
      // duplicate LEFT rows collapse to one map key with one answer —
      // consistent because the join's answer depends only on (k, t)
      run(forward = false) == brute(forward = false) &&
        run(forward = true) == brute(forward = true)
    })
  }

  // right rows (k, t, rp1: NULLABLE, rp2) — rp1 null on ~a third of
  // rows, so the matched row frequently holds a null field while an
  // OLDER (or newer, forward) row holds a value: the exact shape
  // where per-column last-non-null would mix fields across rows
  private val evNullGen: Gen[List[(Long, Long, Option[Long], Long)]] =
    Gen.listOfN(40, for {
      k <- Gen.choose(0L, 2L)
      t <- Gen.choose(0L, 9L)
      p1 <- Gen.option(Gen.choose(0L, 99L))
    } yield (k, t, p1, 0L))
      // rp2 = row index: the tiebreak must be TOTAL or the carried
      // row is genuinely ambiguous (not a defect, just unordered)
      .map(_.zipWithIndex.map { case ((k, t, p1, _), i) =>
        (k, t, p1, i.toLong)
      })

  test("struct-atomic carry: null payload fields never mix rows, both directions") {
    checkProp(Prop.forAllNoShrink(evGen, evNullGen) { (ls, rs) =>
      val left = ls.toDF("k", "t", "lp")
      val right = rs.toDF("k", "t", "rp1", "rp2")
      // the matched row is chosen by (t, rp2) — its rp1 must arrive
      // AS IS (null included), never backfilled from another row
      def brute(forward: Boolean)
          : Map[(Long, Long, Long), Option[(Option[Long], Long)]] =
        ls.map { case (k, t, p) =>
          val cand = rs.filter(r => r._1 == k &&
            (if (forward) r._2 >= t else r._2 <= t))
          val pick =
            if (cand.isEmpty) None
            else if (forward) Some(cand.minBy(r => (r._2, r._4)))
            else Some(cand.maxBy(r => (r._2, r._4)))
          (k, t, p) -> pick.map(r => (r._3, r._4))
        }.toMap
      // keyed on rp2 presence: a matched row with null rp1 yields
      // (None, rp2), an unmatched left row yields None overall
      def run(forward: Boolean)
          : Map[(Long, Long, Long), Option[(Option[Long], Long)]] = {
        val f = if (forward)
          AsOf.asofJoinForward(left, right, "k", "t", Seq(col("rp2")))
        else AsOf.asofJoin(left, right, "k", "t", Seq(col("rp2")))
        f.collect().map { r =>
          val matched = !r.isNullAt(4) // rp2 is non-null on every right row
          (r.getLong(0), r.getLong(1), r.getLong(2)) ->
            (if (!matched) None
             else Some((Option(r.get(3)).map(_.asInstanceOf[Long]),
               r.getLong(4))))
        }.toMap
      }
      run(forward = false) == brute(forward = false) &&
        run(forward = true) == brute(forward = true)
    })
  }

  test("keepFirst keeps exactly the min-ordered row per key") {
    checkProp(Prop.forAllNoShrink(evGen) { rows =>
      val df = rows.toDF("k", "t", "p")
      val got = Dedup.keepFirst(df, Seq("k"), Seq(col("t"), col("p")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val want = rows.groupBy(_._1).values
        .map(g => g.minBy(r => (r._2, r._3))).toSet
      got == want
    })
  }

  test("hash split is a partition: every id in exactly one split") {
    checkProp(Prop.forAllNoShrink(Gen.listOfN(60, Gen.choose(0L, 1000L))) {
      ids =>
        val df = ids.distinct.toDF("id")
        val s = Sampling.split(df, "id", valPct = 10, testPct = 10)
          .collect().map(r => r.getLong(0) -> r.getString(1))
        s.length == ids.distinct.length &&
          s.forall(x => Set("train", "val", "test").contains(x._2))
    })
  }

  // random small docs over a tiny vocabulary: shared shingles are
  // common, so jaccard/containment pairs actually fire
  private val docGen: Gen[List[(Long, String)]] =
    Gen.listOfN(6, Gen.listOfN(8, Gen.choose(0, 5).map(i => s"w$i")))
      .map(_.zipWithIndex.map { case (ws, i) =>
        (i.toLong, ws.mkString(" ")) })

  test("jaccard never exceeds containment in either direction") {
    checkProp(Prop.forAllNoShrink(docGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val j = Dedup.ngramJaccardPairs(df, "doc_id", "text", 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      val c = Dedup.containmentPairs(df, "doc_id", "text", 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      // J = |∩|/|∪| ≤ |∩|/|A| = c(A→B): within the shared round-3
      // rendering, allow one ulp of rounding slack
      j.forall { case ((a, b), jv) =>
        c.get((a, b)).forall(jv <= _ + 1e-9) &&
          c.get((b, a)).forall(jv <= _ + 1e-9)
      }
    }, cases = 4)
  }

  test("incremental batch pairs are EXACTLY the rebuild's new pairs") {
    // the law CurationStore.update rests on, over random corpora and
    // random split points (the fixture specs prove it on the battery
    // corpus only): at unguarded dials,
    //   pairs(old ∪ new) = pairs(old) ⊎ newBatchPairs(new, old)
    // as a DISJOINT union of (a, b, est) triples — nothing missing,
    // nothing invented, estimates identical, no old-old pair leaked
    // into the increment
    val splitDocGen: Gen[(List[(Long, String)], Int)] = for {
      n <- Gen.choose(8, 16)
      split <- Gen.choose(1, n - 1)
      texts <- Gen.listOfN(n, Gen.choose(3, 6).flatMap(len =>
        Gen.listOfN(len, Gen.choose(0, 7).map(i => s"w$i"))
          .map(_.mkString(" "))))
    } yield (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      split)
    checkProp(Prop.forAllNoShrink(splitDocGen) { case (docs, split) =>
      val (oldDocs, newDocs) = docs.splitAt(split)
      def sig(ds: List[(Long, String)]) = Dedup.minhashSignatures(
        ds.toDF("doc_id", "text"), "doc_id", "text", numHashes = 8)
      def set(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val full = set(Dedup.estimatePairsFromSignatures(
        sig(docs), "doc_id", numHashes = 8, numBands = 4))
      val old = set(Dedup.estimatePairsFromSignatures(
        sig(oldDocs), "doc_id", numHashes = 8, numBands = 4))
      val inc = set(Dedup.estimatePairsForNewBatch(
        sig(newDocs), sig(oldDocs), "doc_id",
        numHashes = 8, numBands = 4))
      full == old ++ inc && old.intersect(inc).isEmpty
    }, cases = 4)
  }

  test("weighted sample of k is a prefix of the sample of k+m") {
    val wGen = Gen.listOfN(30,
      Gen.zip(Gen.choose(0L, 500L), Gen.choose(1, 9)))
    checkProp(Prop.forAllNoShrink(wGen) { rows =>
      val df = rows.distinctBy(_._1)
        .map { case (id, w) => (id, w.toDouble) }.toDF("id", "w")
      def ids(k: Int) = Sampling.weightedSample(df, "id", "w", k)
        .collect().map(_.getLong(0)).toSet
      val small = ids(5)
      small.subsetOf(ids(12)) && small.size == math.min(5,
        rows.distinctBy(_._1).size)
    }, cases = 4)
  }
}
