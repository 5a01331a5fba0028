package graft.plans

import graft.SparkSpec
import graft.ops.AsOf
import org.apache.spark.sql.functions._

/** The native as-of join operator (AsOfJoinPlan → AsOfJoinStrategy →
  * AsOfJoinExec) against the window composition it replaces: value
  * equality on the real events fixture and on adversarial
  * micro-fixtures (ties, missing keys, empty right groups), the
  * documented null-time divergence pinned in BOTH directions, and
  * the physical plan asserted (the custom exec, key-clustered
  * exchanges, NO window operator).
  */
class AsOfPlanSpec extends SparkSpec {
  import spark.implicits._

  private def purchases = sf("events")
    .filter(col("event_type") === "purchase")
    .select("event_id", "user_id", "ts")
  private def clicks = sf("events")
    .filter(col("event_type") === "click")
    .select(col("user_id"), col("ts"),
      col("ts").as("click_ts"), col("value").as("click_value"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("native == window composition on the events fixture") {
    val win = AsOf.asofJoin(purchases, clicks, "user_id", "ts",
      rightTiebreak = Seq(col("click_value")))
      .select("event_id", "user_id", "ts", "click_ts", "click_value")
    val nat = AsOf.asofJoinNative(purchases, clicks, "user_id", "ts",
      tiebreak = Seq("click_value"))
      .select("event_id", "user_id", "ts", "click_ts", "click_value")
    val (w, n) = (rows(win), rows(nat))
    assert(n == w, s"native diverges: extra=${n -- w} missing=${w -- n}")
    assert(n.nonEmpty)
  }

  test("native semantics on ties, unmatched keys, and empty groups") {
    val left = Seq((1L, 10L, "l1"), (1L, 5L, "l0"), (2L, 7L, "l2"),
      (3L, 1L, "l3")).toDF("k", "t", "lv")
    val right = Seq((1L, 5L, "a"), (1L, 5L, "b"), (1L, 9L, "c"),
      (2L, 8L, "d")).toDF("k", "t", "rv")
    val out = AsOf.asofJoinNative(left, right, "k", "t",
        tiebreak = Seq("rv"))
      .select("k", "t", "lv", "rv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3))).toSet
    assert(out == Set(
      (1L, 10L, "l1", "c"), // latest at-or-before 10
      (1L, 5L, "l0", "b"),  // tie at t=5: LAST in tiebreak asc wins
      (2L, 7L, "l2", null), // right exists but only in the future
      (3L, 1L, "l3", null)  // key absent on the right
    ))
  }

  test("null keys and null left times never match; null right time " +
      "divergence from the window composition is the documented one") {
    val left = Seq((Some(1L), Some(10L), "a"), (None, Some(10L), "b"),
      (Some(1L), None, "c")).toDF("k", "t", "lv")
    val right = Seq((Some(1L), Some(4L), "r1"), (Some(1L), None, "rnull"),
      (None, Some(3L), "rk")).toDF("k", "t", "rv")
    val nat = AsOf.asofJoinNative(left, right, "k", "t")
      .select("lv", "rv").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // non-null key+time matches the non-null-time right row; null key
    // and null left time match nothing; the null-TIME right row is
    // never carried (the window carry WOULD see it — stricter here)
    assert(nat == Map("a" -> "r1", "b" -> null, "c" -> null))
    val win = AsOf.asofJoin(left, right, "k", "t")
      .select("lv", "rv").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // the window composition carries the nulls-first null-time row
    // for the left row whose time is null — the divergence the
    // native operator's scaladoc documents
    assert(win("c") == "rnull")
  }

  test("random fixture: native == window wherever times are non-null") {
    val rnd = new scala.util.Random(42)
    val left = Seq.tabulate(400)(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(50).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val right = Seq.tabulate(300)(i =>
      (rnd.nextInt(25).toLong, rnd.nextInt(50).toLong, i.toLong))
      .toDF("k", "t", "rid")
    val win = AsOf.asofJoin(left, right, "k", "t",
      rightTiebreak = Seq(col("rid"))).select("k", "t", "lid", "rid")
    val nat = AsOf.asofJoinNative(left, right, "k", "t",
      tiebreak = Seq("rid")).select("k", "t", "lid", "rid")
    assert(rows(nat) == rows(win))
  }

  test("native FORWARD == window forward composition on the events " +
      "fixture and a random fixture") {
    val win = AsOf.asofJoinForward(purchases, clicks, "user_id", "ts",
      rightTiebreak = Seq(col("click_value")))
      .select("event_id", "user_id", "ts", "click_ts", "click_value")
    val nat = AsOf.asofJoinNativeForward(purchases, clicks, "user_id",
      "ts", tiebreak = Seq("click_value"))
      .select("event_id", "user_id", "ts", "click_ts", "click_value")
    assert(rows(nat) == rows(win))
    val rnd = new scala.util.Random(7)
    val left = Seq.tabulate(400)(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(50).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val right = Seq.tabulate(300)(i =>
      (rnd.nextInt(25).toLong, rnd.nextInt(50).toLong, i.toLong))
      .toDF("k", "t", "rid")
    val winR = AsOf.asofJoinForward(left, right, "k", "t",
      rightTiebreak = Seq(col("rid"))).select("k", "t", "lid", "rid")
    val natR = AsOf.asofJoinNativeForward(left, right, "k", "t",
      tiebreak = Seq("rid")).select("k", "t", "lid", "rid")
    assert(rows(natR) == rows(winR))
    // forward tie semantics pinned directly: earliest right at-or-
    // after, SMALLEST tiebreak among (key, time) ties
    val l2 = Seq((1L, 5L, "l")).toDF("k", "t", "lv")
    val r2 = Seq((1L, 5L, "b"), (1L, 5L, "a"), (1L, 9L, "c"))
      .toDF("k", "t", "rv")
    val out = AsOf.asofJoinNativeForward(l2, r2, "k", "t",
      tiebreak = Seq("rv")).select("rv").collect().map(_.getString(0))
    assert(out.toSeq == Seq("a"))
  }

  test("tolerance bounds the lookback (and the lookahead in forward " +
      "mode); boundary inclusive; unsupported time types rejected") {
    val left = Seq((1L, 100L, "l1"), (1L, 10L, "l2"), (2L, 50L, "l3"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 90L, "a"), (1L, 8L, "b"), (2L, 70L, "c"))
      .toDF("k", "t", "rv")
    def back(tol: Long) = AsOf.asofJoinNative(left, right, "k", "t",
        tolerance = Some(tol)).select("lv", "rv").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // unbounded: l1 matches a (dist 10), l2 matches b (dist 2),
    // l3 has only a future right row — no match either way
    assert(back(1000L) == Map("l1" -> "a", "l2" -> "b", "l3" -> null))
    // tol 10 keeps dist-10 (inclusive); tol 5 drops it, keeps dist-2
    assert(back(10L) == Map("l1" -> "a", "l2" -> "b", "l3" -> null))
    assert(back(5L) == Map("l1" -> null, "l2" -> "b", "l3" -> null))
    val fwd = AsOf.asofJoinNativeForward(left, right, "k", "t",
        tolerance = Some(15L)).select("lv", "rv").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // forward: l3's next right row is c at dist 20 > 15 — dropped;
    // l2's next is a at dist 80 — dropped too
    assert(fwd == Map("l1" -> null, "l2" -> null, "l3" -> null))
    val fwd20 = AsOf.asofJoinNativeForward(left, right, "k", "t",
        tolerance = Some(20L)).select("lv", "rv").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fwd20("l3") == "c")
    // a non-measurable time type with a tolerance is an error
    val sLeft = Seq(("1", "x", "l")).toDF("k", "t", "lv")
    val sRight = Seq(("1", "a", "r")).toDF("k", "t", "rv")
    val e = intercept[IllegalArgumentException] {
      AsOf.asofJoinNative(sLeft, sRight, "k", "t",
        tolerance = Some(1L))
    }
    assert(e.getMessage.contains("tolerance needs"))
  }

  test("broadcast-right variant: same rows as the merge walk on the " +
      "events fixture and the adversarial micro-fixtures") {
    val viaB = AsOf.asofJoinNative(purchases, clicks, "user_id", "ts",
      tiebreak = Seq("click_value"), broadcastRight = true)
      .select("event_id", "user_id", "ts", "click_ts", "click_value")
    val viaM = AsOf.asofJoinNative(purchases, clicks, "user_id", "ts",
      tiebreak = Seq("click_value"))
      .select("event_id", "user_id", "ts", "click_ts", "click_value")
    assert(rows(viaB) == rows(viaM))
    // ties/unmatched/empty-group fixture (mirrors the merge-walk test)
    val left = Seq((1L, 10L, "l1"), (1L, 5L, "l0"), (2L, 7L, "l2"),
      (3L, 1L, "l3")).toDF("k", "t", "lv")
    val right = Seq((1L, 5L, "a"), (1L, 5L, "b"), (1L, 9L, "c"),
      (2L, 8L, "d")).toDF("k", "t", "rv")
    val out = AsOf.asofJoinNative(left, right, "k", "t",
        tiebreak = Seq("rv"), broadcastRight = true)
      .select("k", "t", "lv", "rv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3))).toSet
    assert(out == Set((1L, 10L, "l1", "c"), (1L, 5L, "l0", "b"),
      (2L, 7L, "l2", null), (3L, 1L, "l3", null)))
    // null keys/times on either side never match (same contract)
    val lN = Seq((Some(1L), Some(10L), "a"), (None, Some(10L), "b"),
      (Some(1L), None, "c")).toDF("k", "t", "lv")
    val rN = Seq((Some(1L), Some(4L), "r1"), (Some(1L), None, "rnull"),
      (None, Some(3L), "rk")).toDF("k", "t", "rv")
    val nm = AsOf.asofJoinNative(lN, rN, "k", "t",
        broadcastRight = true).select("lv", "rv").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(nm == Map("a" -> "r1", "b" -> null, "c" -> null))
    // forward + tolerance through the broadcast path
    val fb = AsOf.asofJoinNativeForward(left, right, "k", "t",
        tiebreak = Seq("rv"), tolerance = Some(1L),
        broadcastRight = true)
      .select("lv", "rv").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // l2 (k=2,t=7): next right d at t=8, dist 1 — kept; l1 (t=10):
    // nothing at-or-after; l0 (t=5): tie at 5, dist 0, smallest
    // tiebreak a; l3: no key
    assert(fb == Map("l1" -> null, "l0" -> "a", "l2" -> "d",
      "l3" -> null))
  }

  test("broadcast-right plan: zero shuffles, zero sorts, one " +
      "broadcast exchange — the left side passes through") {
    val left = Seq((1L, 10L, "l1"), (2L, 7L, "l2")).toDF("k", "t", "lv")
    val right = Seq((1L, 5L, "a"), (2L, 8L, "d")).toDF("k", "t", "rv")
    val j = AsOf.asofJoinNative(left, right, "k", "t",
      broadcastRight = true)
    j.write.format("noop").mode("overwrite").save()
    val plan = j.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastAsOfJoin"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty,
      s"no clustered exchange expected:\n$plan")
    assert(!plan.contains("Sort "), s"no sort expected:\n$plan")
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("shared-lineage sides: right payload is deduped, not bound to " +
      "the left input position") {
    // both sides filter the SAME frame without aliasing, so the
    // payload column v keeps its exprId on both sides — without the
    // ops-layer re-alias the exec's output projection would bind the
    // joined v to the LEFT position and return the left row's own
    // value (200) instead of the matched right row's (100)
    val base = Seq((1L, 10L, 100L), (1L, 20L, 200L)).toDF("k", "t", "v")
    val left = base.filter(col("v") === 200L)
    val right = base.filter(col("v") === 100L)
    val out = AsOf.asofJoinNative(left, right, "k", "t").collect()
    assert(out.length == 1)
    assert(out.head.getLong(2) == 200L, "left's own v")
    assert(out.head.getLong(3) == 100L,
      "joined payload must carry the RIGHT row's value")
    // and a direct plan construction without the re-alias still
    // fails loudly instead of mis-binding
    val shims = org.apache.spark.sql.graft.Shims
    val e = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoinPlan(shims.logicalPlan(left),
        shims.logicalPlan(right), "k", "t").validateTypes()
    }
    assert(e.getMessage.contains("shares expression ids"))
  }

  test("key/time type mismatch across sides is an immediate error, " +
      "not silently empty results") {
    val left = Seq((1L, 10L, "a")).toDF("k", "t", "lv")
    val rIntKey = Seq((1, 5L, "r")).toDF("k", "t", "rv")
    val e1 = intercept[IllegalArgumentException] {
      AsOf.asofJoinNative(left, rIntKey, "k", "t")
    }
    assert(e1.getMessage.contains("key 'k' type mismatch"))
    val rIntTime = Seq((1L, 5, "r")).toDF("k", "t", "rv")
    val e2 = intercept[IllegalArgumentException] {
      AsOf.asofJoinNative(left, rIntTime, "k", "t")
    }
    assert(e2.getMessage.contains("time 't' type mismatch"))
  }

  test("bucketed-by-key sides plan a ZERO-exchange native as-of") {
    // the serving-layout composition: when both sides are stored
    // bucketed by the join key (same count), the exec's
    // ClusteredDistribution requirements are satisfied by the scan
    // partitioning itself — only per-partition sorts are inserted.
    // At 100 TB this is the quotes/trades join with NO shuffle at
    // query time; the bucketing shuffle was paid once at write time.
    val wh = java.nio.file.Files
      .createTempDirectory("asof-bucketed").toString
    purchases.write.format("parquet").bucketBy(8, "user_id")
      .option("path", s"$wh/l").mode("overwrite")
      .saveAsTable("asof_spec_left")
    clicks.write.format("parquet").bucketBy(8, "user_id")
      .option("path", s"$wh/r").mode("overwrite")
      .saveAsTable("asof_spec_right")
    try {
      val nat = AsOf.asofJoinNative(spark.table("asof_spec_left"),
        spark.table("asof_spec_right"), "user_id", "ts")
      nat.write.format("noop").mode("overwrite").save()
      val plan = nat.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty,
        s"bucketed asof must not shuffle:\n$plan")
      assert(plan.contains("AsOfJoin"))
      // and it returns the same rows as the unbucketed plan
      assert(rows(nat.select("event_id", "click_ts")) ==
        rows(AsOf.asofJoinNative(purchases, clicks, "user_id", "ts")
          .select("event_id", "click_ts")))
    } finally {
      spark.sql("DROP TABLE IF EXISTS asof_spec_left")
      spark.sql("DROP TABLE IF EXISTS asof_spec_right")
    }
  }

  test("physical plan: custom exec, clustered exchanges, no window") {
    val nat = AsOf.asofJoinNative(purchases, clicks, "user_id", "ts")
    nat.write.format("noop").mode("overwrite").save()
    val plan = nat.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window"), "no window operator expected")
    assert("hashpartitioning\\(user_id".r
      .findAllIn(plan).size >= 2, "both sides clustered by key")
  }
}
