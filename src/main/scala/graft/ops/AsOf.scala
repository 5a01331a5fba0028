package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the single latest
  * right row with `rightTime <= leftTime` in the same key group (the
  * quotes/trades classic; Spark has no built-in).
  *
  * Implemented as union + ONE window pass: tag the sides, order within
  * each key by (time, side) so a right row at exactly the left row's
  * time is visible, and carry the last non-null right values forward.
  * One shuffle on the key, cost O(n log n) per key — no range
  * cross-product, no per-row probe. At 100 TB this is the shape that
  * survives: the alternative (range join) explodes on dense right
  * sides, and a broadcast probe dies when the right side outgrows one
  * executor. Skew is bounded by key-group size (salt via
  * [[Skew.saltedJoin]] shapes if a single key's history is extreme).
  */
object AsOf {

  /** @param right must share `keyCol`+`timeCol` names with `left`;
    *   its other columns (the payload) must not collide with left's —
    *   rename before calling.
    * @param rightTiebreak deterministic order among right rows TIED on
    *   (key, time): the row sorting LAST by these columns is the one
    *   carried. Sorts after (time, side), so it only ever reorders
    *   tied right rows (left rows hold nulls there, which cannot
    *   outrank the side ordering). Without it, ties carry an
    *   arbitrary row.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, rightTiebreak: Seq[Column] = Nil): DataFrame =
    asofJoinImpl(left, right, keyCol, timeCol, rightTiebreak,
      forward = false)

  /** FORWARD as-of: for each left row, the single EARLIEST right row
    * with `rightTime >= leftTime` (next-event attribution — "first
    * action after the purchase"). Same union + one-window plan as
    * the backward join, iterated in descending time; among right
    * rows tied on (key, time) the SMALLEST tiebreak is carried
    * (mirror of backward's largest-last convention).
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, rightTiebreak: Seq[Column] = Nil): DataFrame =
    asofJoinImpl(left, right, keyCol, timeCol, rightTiebreak,
      forward = true)

  /** NATIVE backward as-of join — same semantics as [[asofJoin]] on
    * non-null keys/times, executed by the custom physical operator
    * ([[graft.plans.AsOfJoinExec]]: key-clustered, time-sorted
    * merge walk, O(1) state per key) instead of the union + window
    * composition. Prefer this form at scale — the window buffers a
    * hot key's whole frame, the merge walk never holds more than one
    * candidate row; see AsOfJoinPlan's scaladoc for the one
    * null-time divergence. `tiebreak` names right-side columns (must
    * exist on `right`) ordering ties on (key, time); the LAST in
    * ascending tiebreak order is carried, matching [[asofJoin]].
    *
    * Two optional dials complete the family (AsOfJoinPlan scaladoc):
    * `tolerance` bounds the lookback — a match farther than this many
    * native time units (µs for timestamps, days for dates, the value
    * itself for integrals) behind the left time is discarded;
    * `broadcastRight` plans the tiny-dimension shape — the right side
    * broadcasts whole and the LEFT side keeps its partitioning (zero
    * exchanges and zero sorts on the big side).
    */
  def asofJoinNative(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, tiebreak: Seq[String] = Nil,
      tolerance: Option[Long] = None,
      broadcastRight: Boolean = false): DataFrame =
    native(left, right, keyCol, timeCol, tiebreak, forward = false,
      tolerance, broadcastRight)

  /** NATIVE forward as-of — [[asofJoinForward]]'s semantics (earliest
    * right row with `rightTime >= leftTime`; smallest tiebreak among
    * ties) through the same merge-walk exec, time-mirrored: both
    * sides sort time-DESCENDING and the identical last-wins walk
    * lands on the earliest matching row.
    */
  def asofJoinNativeForward(left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String,
      tiebreak: Seq[String] = Nil,
      tolerance: Option[Long] = None,
      broadcastRight: Boolean = false): DataFrame =
    native(left, right, keyCol, timeCol, tiebreak, forward = true,
      tolerance, broadcastRight)

  /** Hot-key mitigation — the native as-of with the TIME RANGE
    * pre-split the operator's scaladoc prescribes, packaged: the one
    * case the merge walk cannot parallelize is a monster key whose
    * whole history lands in one task (AQE never splits a custom
    * exec's partitions). This rewrite restores parallelism EXACTLY:
    *
    *  1. slice the LEFT time range into `slices` equal tick windows
    *     (ticks: native units — µs for timestamps, days for dates,
    *     the value for integrals);
    *  2. each right row joins its own slice; clamped below/above
    *     into the first/last slice (early rows genuinely belong to
    *     slice 0's lookback; late rows can never match backward);
    *  3. per (key, slice), the LATEST right row (by time, tiebreak)
    *     is computed — a parallel per-slice reduction — and carried
    *     into every later slice over a (key × slice) grid, so a left
    *     row preceding its slice's first right row still finds the
    *     true match (the latest right row of any earlier slice);
    *  4. the native merge walk runs keyed on (key, slice) — the
    *     monster key is now `slices` independent tasks — and the
    *     helper columns are dropped.
    *
    * Exactness (backward): a left row's true match is either inside
    * its own slice (present) or the globally-latest right row of an
    * earlier slice — which is exactly the carried row, because no
    * later right row separates them. Forward mode mirrors: earliest
    * right at-or-after, carried from later slices into earlier ones.
    * `tolerance` composes (it post-checks the nearest candidate,
    * which the rewrite preserves). AsOfPresplitSpec pins equality
    * with the plain native join on random and monster-key fixtures;
    * the `asof_hotkey` tier's `presplit` rows measure the straggler
    * bound dropping with slice count.
    *
    * Costs, stated: one bounded driver read (min/max tick of the
    * left side), a keys×slices carry grid, and right-side row
    * duplication of at most one row per (key, nonempty later
    * slice). A production caller routes ONLY monster keys through
    * this shape (split the input by a key-frequency sketch, union
    * the plain join of the rest) — the rewrite is exact either way,
    * so the routing is purely a cost decision.
    */
  def asofJoinNativePresplit(left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String, slices: Int,
      tiebreak: Seq[String] = Nil, forward: Boolean = false,
      tolerance: Option[Long] = None): DataFrame = {
    require(slices >= 1, s"slices must be >= 1, got $slices")
    val sl = "_asof_sl"; val k2 = "_asof_k2"
    require(!(left.columns ++ right.columns).exists(
        c => c == sl || c == k2),
      s"column names $sl/$k2 are reserved by asofJoinNativePresplit")
    import org.apache.spark.sql.expressions.Window
    def tick(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(c)
        case org.apache.spark.sql.types.TimestampNTZType =>
          unix_micros(c.cast("timestamp"))
        case org.apache.spark.sql.types.DateType => unix_date(c)
        case _ => c.cast("long")
      }
    val lTick = tick(col(timeCol), left.schema(timeCol).dataType)
    // tick() is IntegerType for DateType inputs (unix_date) — cast
    // the extremes to long IN the aggregation so the driver read
    // below is type-stable across every supported time type
    val range = left.agg(min(lTick).cast("long"),
      max(lTick).cast("long")).head()
    if (slices == 1 || range.isNullAt(0) || range.getLong(0) == range.getLong(1))
      return native(left, right, keyCol, timeCol, tiebreak, forward,
        tolerance, broadcastRight = false)
    val (mn, mx) = (range.getLong(0), range.getLong(1))
    // slice width as DRIVER long arithmetic; the per-row division
    // below keeps its numerator <= the left span, which is exactly
    // representable as a double (right rows far outside the range
    // may round, but they clamp into the edge slices either way).
    // Exactness never needs equal widths — only that the slice map
    // is deterministic and monotone in the tick, which floor of an
    // IEEE division by a positive constant is.
    val width = math.max(1L, (mx - mn) / slices + 1)
    def sliceOf(t: Column, dt: org.apache.spark.sql.types.DataType) =
      least(lit(slices - 1L), greatest(lit(0L),
        floor((tick(t, dt) - lit(mn)) / lit(width))))
    // the composite key is NULL whenever the real key is (a struct
    // with a null FIELD is non-null and would make null keys match
    // each other — the base operator's "null key never matches"
    // contract must survive the rewrite)
    def key2(slc: Column) = when(col(keyCol).isNotNull,
      struct(col(keyCol).as("k"), slc.as("s"))).otherwise(lit(null))
    val l2 = left
      .withColumn(sl, sliceOf(col(timeCol), left.schema(timeCol).dataType))
      .withColumn(k2, key2(col(sl)))
    val rDt = right.schema(timeCol).dataType
    val rSliced = right.withColumn(sl, sliceOf(col(timeCol), rDt))
    // per (key, slice) extreme row — LATEST for backward, EARLIEST
    // for forward (ties: the row the base operator's convention
    // would carry)
    val ord =
      if (forward) (col(timeCol).asc +: tiebreak.map(col(_).asc))
      else (col(timeCol).desc +: tiebreak.map(col(_).desc))
    val extremes = rSliced
      .withColumn("_asof_rn", row_number().over(
        Window.partitionBy(col(keyCol), col(sl)).orderBy(ord: _*)))
      .filter(col("_asof_rn") === 1).drop("_asof_rn")
    // carry grid: every (key, slice) learns the extreme row of the
    // nearest nonempty earlier (backward) / later (forward) slice
    val grid = rSliced.select(col(keyCol)).distinct()
      .crossJoin(right.sparkSession.range(slices.toLong)
        .select(col("id").as("_asof_target")))
    val carryW = Window.partitionBy(col(keyCol))
      .orderBy(if (forward) col("_asof_target").desc
               else col("_asof_target").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val payloadCols = right.columns.toIndexedSeq
    val carried = grid
      .join(extremes.withColumnRenamed(sl, "_asof_target"),
        Seq(keyCol, "_asof_target"), "left_outer")
      .withColumn("_asof_carry", last(
        when(col(timeCol).isNotNull,
          struct(payloadCols.filterNot(_ == keyCol).map(col): _*)),
        ignoreNulls = true).over(carryW))
      .filter(col("_asof_carry").isNotNull)
      .select(col(keyCol) +: col("_asof_target").as(sl) +:
        payloadCols.filterNot(_ == keyCol)
          .map(c => col(s"_asof_carry.$c").as(c)): _*)
    val r2 = rSliced.select(payloadCols.map(col) :+ col(sl): _*)
      .unionByName(carried.select(payloadCols.map(col) :+ col(sl): _*))
      .withColumn(k2, key2(col(sl)))
      .drop(keyCol, sl)
    native(l2, r2, k2, timeCol, tiebreak, forward,
      tolerance, broadcastRight = false)
      .drop(k2, sl)
      .select(left.columns.map(col) ++
        right.columns.filterNot(c => c == keyCol || c == timeCol)
          .map(col): _*)
  }

  private def native(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, tiebreak: Seq[String],
      forward: Boolean, tolerance: Option[Long] = None,
      broadcastRight: Boolean = false): DataFrame = {
    val shims = org.apache.spark.sql.graft.Shims
    val lPlan = shims.logicalPlan(left)
    // Built-in Join dedups shared-lineage right attributes in the
    // analyzer (dedupRight); a custom node gets no such pass. If the
    // two sides share lineage (e.g. both filter the same frame) a
    // right payload attribute can keep a LEFT-side exprId — the
    // exec's output projection binds by exprId against (left ++
    // right), so the duplicate would bind to the LEFT input position
    // and silently return the left row's own value. Re-aliasing
    // every right column mints fresh exprIds, restoring the built-in
    // join's semantics transparently.
    val rightDeduped =
      if (lPlan.outputSet
          .intersect(shims.logicalPlan(right).outputSet).isEmpty) right
      else right.select(right.columns.toIndexedSeq
        .map(c => org.apache.spark.sql.functions.col(c).as(c)): _*)
    val node = graft.plans.AsOfJoinPlan(lPlan,
      shims.logicalPlan(rightDeduped), keyCol, timeCol, tiebreak,
      forward, tolerance, broadcastRight)
    node.validateTypes() // fail-fast; the strategy re-checks
    shims.ofRows(left.sparkSession, node)
  }

  private def asofJoinImpl(left: DataFrame, right: DataFrame,
      keyCol: String, timeCol: String, rightTiebreak: Seq[Column],
      forward: Boolean): DataFrame = {
    val payload = right.columns.filterNot(c => c == keyCol || c == timeCol)
    require(!left.columns.contains("_side") && !payload.contains("_side"),
      "column name _side is reserved by asofJoin")
    val l = left.withColumn("_side", lit(1))
    val r = right.withColumn("_side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    // forward mirrors the iteration: time DESC makes "last non-null
    // seen" the nearest FUTURE right row; _side stays ASC so a right
    // row at exactly the left row's time remains visible; tied right
    // rows sort so the conventional row lands LAST (carried).
    val timeOrd = if (forward) col(timeCol).desc else col(timeCol).asc
    val tieOrd = rightTiebreak.map(c => if (forward) c.desc else c.asc)
    val w = Window.partitionBy(keyCol)
      .orderBy(timeOrd +: col("_side").asc +: tieOrd: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry the whole payload as ONE struct so the matched row stays
    // atomic: per-column last-non-null would mix fields from different
    // right rows whenever a later right row holds a null field.
    val packed = when(col("_side") === 0,
      struct(payload.toIndexedSeq.map(col): _*)).otherwise(lit(null))
    val carried = u.withColumn("_asof", last(packed, ignoreNulls = true).over(w))
    payload.foldLeft(carried)((d, c) => d.withColumn(c, col(s"_asof.$c")))
      .filter(col("_side") === 1)
      .drop("_side", "_asof")
  }
}
