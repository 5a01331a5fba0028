package graft.plans

import graft.SparkSpec
import graft.ops.AsOf
import org.apache.spark.sql.functions._

/** The time-range pre-split rewrite
  * ([[graft.ops.AsOf.asofJoinNativePresplit]]) against the plain
  * native join it parallelizes: frame equality on random fixtures
  * (both directions, with tiebreaks and tolerances), on the
  * monster-key fixture the rewrite exists for, and on the null/edge
  * contracts the base operator pins. Parallelism itself is measured
  * in the `asof_hotkey` scaling tier (`presplit` rows) — this spec
  * owns EXACTNESS.
  */
class AsOfPresplitSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def randomSides(seed: Int, keys: Int) = {
    val rnd = new scala.util.Random(seed)
    val left = Seq.tabulate(500)(i =>
      (rnd.nextInt(keys).toLong, rnd.nextInt(200).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val right = Seq.tabulate(400)(i =>
      (rnd.nextInt(keys + 3).toLong, rnd.nextInt(200).toLong, i.toLong))
      .toDF("k", "t", "rid")
    (left, right)
  }

  test("presplit == plain native on random fixtures, both directions, " +
      "several slice counts") {
    val (l, r) = randomSides(11, 12)
    for (slices <- Seq(1, 2, 7, 50)) {
      val back = AsOf.asofJoinNativePresplit(l, r, "k", "t", slices,
        tiebreak = Seq("rid"))
      val backPlain = AsOf.asofJoinNative(l, r, "k", "t",
        tiebreak = Seq("rid"))
      assert(rows(back) == rows(backPlain), s"backward, slices=$slices")
      val fwd = AsOf.asofJoinNativePresplit(l, r, "k", "t", slices,
        tiebreak = Seq("rid"), forward = true)
      val fwdPlain = AsOf.asofJoinNativeForward(l, r, "k", "t",
        tiebreak = Seq("rid"))
      assert(rows(fwd) == rows(fwdPlain), s"forward, slices=$slices")
    }
  }

  test("presplit == plain native on the monster-key fixture (every " +
      "row one key) and composes with tolerance") {
    val n = 4000L
    val right = spark.range(n).select(lit(0L).as("k"),
      ((col("id") * 2654435761L) % n).as("t"), col("id").as("rid"))
    val left = spark.range(n / 4).select(lit(0L).as("k"),
      ((col("id") * 40503L) % n).as("t"), col("id").as("lid"))
    val split = AsOf.asofJoinNativePresplit(left, right, "k", "t", 16)
    val plain = AsOf.asofJoinNative(left, right, "k", "t")
    assert(rows(split) == rows(plain))
    assert(split.count() == n / 4)
    // tolerance arm over a SPARSE right side (every 13th row), so
    // some nearest matches genuinely exceed the bound
    val sparse = right.filter(col("rid") % 13 === 0)
    val splitTol = AsOf.asofJoinNativePresplit(left, sparse, "k", "t",
      16, tolerance = Some(5L))
    val plainTol = AsOf.asofJoinNative(left, sparse, "k", "t",
      tolerance = Some(5L))
    assert(rows(splitTol) == rows(plainTol))
    // the tolerance really bites (some matches dropped)
    assert(splitTol.filter(col("rid").isNull).count() >
      AsOf.asofJoinNative(left, sparse, "k", "t")
        .filter(col("rid").isNull).count())
  }

  test("presplit preserves the null contracts and edge cases") {
    val left = Seq((Some(1L), Some(10L), "a"), (None, Some(10L), "b"),
      (Some(1L), None, "c"), (Some(9L), Some(3L), "d"))
      .toDF("k", "t", "lv")
    val right = Seq((Some(1L), Some(4L), "r1"), (Some(1L), None, "rnull"),
      (None, Some(3L), "rk")).toDF("k", "t", "rv")
    val split = AsOf.asofJoinNativePresplit(left, right, "k", "t", 4)
      .select("lv", "rv").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // same as the base operator: null key and null left time never
    // match, a null-time right row is never carried, an unmatched
    // key keeps null payloads
    assert(split == Map("a" -> "r1", "b" -> null, "c" -> null,
      "d" -> null))
    // empty left degenerates to the plain join without failing
    assert(AsOf.asofJoinNativePresplit(left.filter(lit(false)), right,
      "k", "t", 4).count() == 0)
    // empty right: all-null payloads, row count preserved
    assert(AsOf.asofJoinNativePresplit(left, right.filter(lit(false)),
      "k", "t", 4).filter(col("rv").isNull).count() == 4)
  }

  test("events-fixture equality with the window composition (the " +
      "q142 join, pre-split)") {
    val ev = sf("events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("ts").as("click_ts"), col("value").as("click_value"))
    val split = AsOf.asofJoinNativePresplit(purchases, clicks,
      "user_id", "ts", 8, tiebreak = Seq("click_value"))
      .select("event_id", "click_ts", "click_value")
    val plain = AsOf.asofJoinNative(purchases, clicks, "user_id", "ts",
      tiebreak = Seq("click_value"))
      .select("event_id", "click_ts", "click_value")
    assert(rows(split) == rows(plain))
    assert(split.count() > 0)
  }

  test("presplit == plain native on DateType time columns (ticks = " +
      "days; the driver min/max read must survive the int tick)") {
    val rnd = new scala.util.Random(7)
    val left = Seq.tabulate(300)(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(400), i.toLong))
      .toDF("k", "d", "lid")
      .select(col("k"), date_add(lit("2024-01-01").cast("date"),
        col("d")).as("t"), col("lid"))
    val right = Seq.tabulate(250)(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(400), i.toLong))
      .toDF("k", "d", "rid")
      .select(col("k"), date_add(lit("2024-01-01").cast("date"),
        col("d")).as("t"), col("rid"))
    for (slices <- Seq(2, 9)) {
      val split = AsOf.asofJoinNativePresplit(left, right, "k", "t",
        slices, tiebreak = Seq("rid"))
      val plain = AsOf.asofJoinNative(left, right, "k", "t",
        tiebreak = Seq("rid"))
      assert(rows(split) == rows(plain), s"date backward, slices=$slices")
    }
    // tolerance in days composes (native unit for dates)
    val sparse = right.filter(col("rid") % 11 === 0)
    assert(rows(AsOf.asofJoinNativePresplit(left, sparse, "k", "t", 5,
        tolerance = Some(30L))) ==
      rows(AsOf.asofJoinNative(left, sparse, "k", "t",
        tolerance = Some(30L))))
  }

  test("reserved helper column names are rejected loudly") {
    val l = Seq((1L, 1L, 1L)).toDF("k", "t", "_asof_sl")
    val r = Seq((1L, 1L, 1L)).toDF("k", "t", "rid")
    val e = intercept[IllegalArgumentException] {
      AsOf.asofJoinNativePresplit(l, r, "k", "t", 4)
    }
    assert(e.getMessage.contains("reserved"))
  }
}
