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
