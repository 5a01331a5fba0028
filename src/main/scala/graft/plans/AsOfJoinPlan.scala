package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.{ByteType, DataType, DateType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}

/** Native backward AS-OF join — the whole-operator extension point
  * exercised end to end: a custom logical node ([[AsOfJoinPlan]]), a
  * planner [[SparkStrategy]] ([[AsOfJoinStrategy]], injected via
  * `GraftExtensions`) and a physical [[AsOfJoinExec]] that
  * merge-walks the two key-clustered, time-sorted children — the
  * execution shape native time-series engines (kdb, QuestDB, Flink's
  * temporal join) give this operator.
  *
  * The composed alternative ([[graft.ops.AsOf.asofJoin]], q33) is
  * union → one window over (key, time, side) → struct-carry →
  * filter: semantically identical, but it materializes the union,
  * sorts BOTH sides together in each key partition's window buffer
  * and carries a payload struct per row. The native operator sorts
  * each side separately (smaller runs), streams both sorted
  * iterators once with O(1) state per key (the latest matching right
  * row), and emits left ⋈ payload directly — no union row growth, no
  * window state, no struct churn. Shuffle volume is the same (both
  * plans cluster both sides by key once); the win is the sort/window
  * memory profile and the per-row work, which is what matters when
  * the window buffer for a hot key stops fitting at 100 TB. And when
  * both sides are STORED bucketed by the key (same count), the scan
  * partitioning satisfies the exec's distribution requirements
  * directly: the whole as-of plans with ZERO exchanges — only
  * per-partition sorts — the quotes/trades serving shape
  * (AsOfPlanSpec pins it).
  *
  * Semantics (deliberately SQL-flavored, matching DuckDB `ASOF LEFT
  * JOIN` and the q33 oracle): for each left row, the LAST right row
  * in (time, tiebreak) order with equal key and `rightTime <=
  * leftTime`; unmatched lefts keep null payloads. A NULL key or NULL
  * left time never matches; a NULL right time never matches either —
  * note this last point is where the operator is STRICTER than the
  * window composition (whose nulls-first carry would match a
  * null-time right row); AsOfPlanSpec pins both the equality on
  * non-null times and this divergence explicitly.
  *
  * Two optional shapes complete the operator family:
  *
  *  - `tolerance` BOUNDS the lookback (lookahead in forward mode):
  *    a match further than `tolerance` from the left time — in the
  *    time column's native unit (integral value, µs for timestamps,
  *    days for dates) — is discarded and the left row keeps null
  *    payloads, the `p.ts - c.ts <= tol` form real attribution joins
  *    use. Because the walk's candidate is always the NEAREST
  *    matching right row, the bound is a post-check on it: no earlier
  *    (farther) row could pass where the nearest failed.
  *  - `broadcastRight` plans [[BroadcastAsOfJoinExec]] instead: the
  *    right side broadcasts whole (rates, config epochs — dimensions
  *    of a few thousand rows), each task builds a per-key time-sorted
  *    index once and binary-searches it per left row. The LEFT side
  *    keeps its incoming partitioning — ZERO exchanges and zero
  *    sorts on the 100 TB side, where the merge walk would pay a
  *    clustered exchange + sort on both. Wrong tool for a large
  *    right side by construction (the index lives on every task);
  *    the merge walk remains the default.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    keyCol: String, timeCol: String,
    tiebreakCols: Seq[String] = Nil,
    forward: Boolean = false,
    tolerance: Option[Long] = None,
    broadcastRight: Boolean = false) extends BinaryNode {

  private def find(side: LogicalPlan, name: String): Attribute = {
    val hits = side.output.filter(_.name == name)
    require(hits.length == 1,
      s"asof join: expected exactly one column named '$name', " +
        s"found ${hits.length}")
    hits.head
  }

  lazy val leftKey: Attribute = find(left, keyCol)
  lazy val leftTime: Attribute = find(left, timeCol)
  lazy val rightKey: Attribute = find(right, keyCol)
  lazy val rightTime: Attribute = find(right, timeCol)

  /** Right rows tied on (key, time) resolve to the LAST in tiebreak
    * ASC order — the window composition's largest-last convention.
    */
  lazy val rightTiebreak: Seq[Attribute] = tiebreakCols.map(find(right, _))

  /** Right payload = everything but the join key and time. */
  lazy val rightPayload: Seq[Attribute] = right.output
    .filterNot(a => a.exprId == rightKey.exprId ||
      a.exprId == rightTime.exprId)

  /** Key/time types must MATCH across sides: the two
    * ClusteredDistributions hash their own side's type (int 5 and
    * long 5 hash differently — equal keys would land in different
    * partitions) and the exec's orderings are built from the left
    * types. A mismatch must be an error, not silently empty results —
    * cast before joining. NOT a constructor require: plan
    * CANONICALIZATION rebuilds the node over children whose attribute
    * names are normalized away (observed via the cache manager's
    * sameResult checks once other plans are cached), and an eager
    * check would throw on that internal copy. Called by
    * [[graft.ops.AsOf.asofJoinNative]] (fail-fast for the user) and
    * by [[AsOfJoinStrategy]] (the safety net on the real plan).
    */
  def validateTypes(): Unit = {
    val dtu = org.apache.spark.sql.catalyst.types.DataTypeUtils
    require(dtu.sameType(leftKey.dataType, rightKey.dataType),
      s"asof join: key '$keyCol' type mismatch — " +
        s"left ${leftKey.dataType.sql} vs right ${rightKey.dataType.sql}")
    require(dtu.sameType(leftTime.dataType, rightTime.dataType),
      s"asof join: time '$timeCol' type mismatch — " +
        s"left ${leftTime.dataType.sql} vs right ${rightTime.dataType.sql}")
    // duplicate exprIds between the left output and the right PAYLOAD
    // would make the exec's output projection bind the payload to the
    // left input position — silently returning the left row's own
    // value. [[graft.ops.AsOf]] re-aliases shared-lineage right sides
    // before building the node; this guards direct constructions.
    // (Key/time exprId sharing is harmless: those attributes are
    // projected only against their own side's schema.)
    require(left.outputSet.intersect(
        org.apache.spark.sql.catalyst.expressions
          .AttributeSet(rightPayload)).isEmpty,
      "asof join: right payload shares expression ids with the left " +
        "side (shared lineage) — alias the right side's columns " +
        "before joining")
    tolerance.foreach { t =>
      require(t >= 0, s"asof join: tolerance must be >= 0, got $t")
      require(AsOfTime.supported(leftTime.dataType),
        s"asof join: tolerance needs an integral/timestamp/date time " +
          s"column to measure distance in — '" + timeCol +
          s"' is ${leftTime.dataType.sql}")
    }
  }

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  /** The node consumes EVERY child column (key, time and the whole
    * payload), and says so: with the default (expression-derived,
    * here empty) references, column pruning is free to strip child
    * columns this operator reads positionally at execution —
    * observed as the optimizer pruning the right key out from under
    * the planner. Conservative by design: project before the join
    * if the payload should narrow.
    */
  override def references: org.apache.spark.sql.catalyst.expressions
      .AttributeSet =
    org.apache.spark.sql.catalyst.expressions
      .AttributeSet(left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]; a no-op for every
  * other node, so unconditional injection is safe.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      p.validateTypes()
      if (p.broadcastRight)
        BroadcastAsOfJoinExec(planLater(p.left), planLater(p.right),
          p.leftKey, p.leftTime, p.rightKey, p.rightTime,
          p.rightTiebreak, p.output, p.forward, p.tolerance) :: Nil
      else
        AsOfJoinExec(planLater(p.left), planLater(p.right),
          p.leftKey, p.leftTime, p.rightKey, p.rightTime,
          p.rightTiebreak, p.output, p.forward, p.tolerance) :: Nil
    case _ => Nil
  }
}

/** Time-distance extraction for the tolerance bound: the time column
  * read as a long in its own native unit (integral value, µs for
  * timestamps — both TZ and NTZ store epoch-µs longs — days for
  * dates). Applied to SINGLE-COLUMN projected rows, position 0.
  */
private[plans] object AsOfTime {
  def supported(dt: DataType): Boolean = extractor(dt) != null

  def extractor(dt: DataType): InternalRow => Long = dt match {
    case LongType | TimestampType | TimestampNTZType => _.getLong(0)
    case IntegerType | DateType => _.getInt(0).toLong
    case ShortType => _.getShort(0).toLong
    case ByteType => _.getByte(0).toLong
    case _ => null
  }
}

/** Merge-walk backward as-of join. Children arrive clustered by key
  * (EnsureRequirements co-partitions the two ClusteredDistributions)
  * and sorted by (key ASC, time ASC) — right-side ties on (key,
  * time) stay in their sorted order, so "last wins" reproduces the
  * window composition's largest-tiebreak convention when the caller
  * pre-sorts ties. Per partition both iterators are consumed ONCE;
  * per-key state is a single copied right row (the current best
  * match), so memory is O(1) regardless of key skew — the window
  * alternative buffers the hot key's whole frame.
  *
  * KNOWN LIMIT — hot-key TIME skew: O(1) memory does not parallelize
  * a monster key's WALK; one key's whole history is one task's
  * serial time, and AQE's OptimizeSkewedJoin only splits the
  * built-in join execs, never a custom one — the skewed partition
  * arrives intact. The `asof_hotkey` tier's `*_skew` rows
  * (SCALING.jsonl, AsofScaling) measure the straggler bound
  * (max task run ≈ stage wall-clock on an 8×-skewed key, window and
  * native alike; native's constant factor is the smaller). The
  * mitigation is PACKAGED as
  * [[graft.ops.AsOf.asofJoinNativePresplit]]: slice the left time
  * range, give each slice its own right rows plus the carried
  * extreme row of the nearest nonempty earlier (later, forward)
  * slice, and run this exec keyed on (key, slice) — exact in both
  * directions (AsOfPresplitSpec), parallelism measured in the
  * `asof_hotkey` tier's `presplit` rows. Routing only monster keys
  * through it is the caller's cost decision; the rewrite itself is
  * always exact.
  */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    rightTiebreak: Seq[Attribute], output: Seq[Attribute],
    forward: Boolean = false, tolerance: Option[Long] = None)
  extends BinaryExecNode {

  /** FORWARD mode is the time-mirrored walk: sorting both sides by
    * time (and tiebreak) DESCENDING and negating the time comparison
    * turns "last right row with rt <= lt" into "earliest right row
    * with rt >= lt, smallest tiebreak among ties" — the exact
    * last-wins algorithm runs unchanged. Nulls still never match:
    * descending order moves null times/keys to the END of each run,
    * where the same guards skip them.
    */
  private def timeDir = if (forward) Descending else Ascending

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, timeDir)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, timeDir))
      ++ rightTiebreak.map(SortOrder(_, timeDir)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val out = output
    val (lk, lt, rk, rt) = (leftKey, leftTime, rightKey, rightTime)
    val sign = if (forward) -1 else 1
    val tol = tolerance
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lk), lOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      // tolerance post-check on the nearest match: the walk's
      // candidate is the closest matching right row, so distance >
      // tol on IT means no row passes (validateTypes pinned the type)
      val timeGet = AsOfTime.extractor(lt.dataType)
      def withinTol(ltRow: InternalRow, best: InternalRow): Boolean =
        tol.isEmpty || sign * (timeGet(ltRow) -
          timeGet(rTimeProj(best))) <= tol.get
      val keyOrd = RowOrdering
        .createNaturalAscendingOrdering(Seq(lk.dataType))
      val timeOrd = RowOrdering
        .createNaturalAscendingOrdering(Seq(lt.dataType))
      // bind against NULLABLE right attrs: unmatched lefts join an
      // all-null right row, and a non-nullable binding would read
      // primitive slots as 0 instead of null
      val proj = UnsafeProjection.create(out,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      var cur: InternalRow = if (rIter.hasNext) rIter.next() else null
      var best: InternalRow = null
      var bestKey: InternalRow = null
      lIter.map { l =>
        val lkRow = lKeyProj(l)
        if (lkRow.isNullAt(0)) {
          joined(l, nullRight) // null key never matches
        } else {
          // a best carried from a previous (smaller) key is stale
          if (best != null && keyOrd.compare(bestKey, lkRow) != 0) {
            best = null; bestKey = null
          }
          val ltRow = lTimeProj(l)
          var done = ltRow.isNullAt(0) // null left time never matches
          while (!done && cur != null) {
            val rkRow = rKeyProj(cur)
            val c =
              if (rkRow.isNullAt(0)) -1 // null right keys sort first
              else keyOrd.compare(rkRow, lkRow)
            if (c < 0) {
              cur = if (rIter.hasNext) rIter.next() else null
            } else if (c == 0) {
              val rtRow = rTimeProj(cur)
              if (rtRow.isNullAt(0)) {
                // null right time: sorted first, never a match
                cur = if (rIter.hasNext) rIter.next() else null
              } else if (sign * timeOrd.compare(rtRow, ltRow) <= 0) {
                best = cur.copy(); bestKey = rkRow.copy()
                cur = if (rIter.hasNext) rIter.next() else null
              } else done = true
            } else done = true
          }
          joined(l,
            if (best != null && !ltRow.isNullAt(0) &&
              withinTol(ltRow, best)) best else nullRight)
        }
        numOutputRows += 1
        proj(joined)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Broadcast-right as-of join — the rates/config-epoch enrichment
  * shape: the right side is a SMALL dimension (its whole history fits
  * one executor many times over), so instead of clustering and
  * sorting BOTH sides, the right side rides a broadcast
  * ([[IdentityBroadcastMode]] — plain row array, no hashed-relation
  * keying), each task groups it into a per-key time-sorted index
  * once, and every left row binary-searches its key's history. The
  * left child keeps its incoming partitioning and ordering: at
  * 100 TB the enrichment costs ZERO exchanges and zero sorts on the
  * big side — the property the clustered merge walk cannot offer.
  *
  * Semantics are identical to [[AsOfJoinExec]] (AsOfPlanSpec pins
  * the equality on shared fixtures): backward picks the sorted
  * run's LAST row at-or-before the left time (ties resolve largest-
  * tiebreak), forward the FIRST row at-or-after (smallest tiebreak),
  * nulls never match on either side, `tolerance` discards matches
  * farther than the bound in the time column's native unit.
  */
case class BroadcastAsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    rightTiebreak: Seq[Attribute], output: Seq[Attribute],
    forward: Boolean, tolerance: Option[Long])
  extends BinaryExecNode {

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val bc = right.executeBroadcast[Array[InternalRow]]()
    val lOut = left.output
    val rOut = right.output
    val out = output
    val (lk, lt, rk, rt) = (leftKey, leftTime, rightKey, rightTime)
    val ties = rightTiebreak
    val fwd = forward
    val tol = tolerance
    left.execute().mapPartitions { lIter =>
      val lKeyProj = UnsafeProjection.create(Seq(lk), lOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val rSortProj = UnsafeProjection.create(rt +: ties, rOut)
      val sortOrd = RowOrdering.createNaturalAscendingOrdering(
        (rt +: ties).map(_.dataType))
      val timeOrd = RowOrdering
        .createNaturalAscendingOrdering(Seq(rt.dataType))
      val timeGet = AsOfTime.extractor(lt.dataType)
      // per-key (sortKey, timeRow, row) copies, sorted (time, ties)
      // ASC — built once per task from the broadcast array; null
      // right keys/times are dropped at build (they never match)
      val index = new java.util.HashMap[InternalRow,
        scala.collection.mutable.ArrayBuffer[
          (InternalRow, InternalRow, InternalRow)]]()
      bc.value.foreach { r =>
        val k = rKeyProj(r)
        if (!k.isNullAt(0) && !rTimeProj(r).isNullAt(0)) {
          var buf = index.get(k)
          if (buf == null) {
            buf = new scala.collection.mutable.ArrayBuffer[
              (InternalRow, InternalRow, InternalRow)]()
            index.put(k.copy(), buf)
          }
          buf += ((rSortProj(r).copy(), rTimeProj(r).copy(), r.copy()))
        }
      }
      index.values.forEach(_.sortInPlace()(
        Ordering.by[(InternalRow, InternalRow, InternalRow),
          InternalRow](_._1)(sortOrd)))
      val proj = UnsafeProjection.create(out,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      lIter.map { l =>
        val lkRow = lKeyProj(l)
        val ltRow = lTimeProj(l)
        var m: InternalRow = null
        if (!lkRow.isNullAt(0) && !ltRow.isNullAt(0)) {
          val buf = index.get(lkRow)
          if (buf != null) {
            // backward: LAST index with t <= lt (ties sorted ASC, so
            // the last tied row carries the largest tiebreak);
            // forward: FIRST index with t >= lt (smallest tiebreak)
            var lo = 0; var hi = buf.length - 1; var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              val c = timeOrd.compare(buf(mid)._2, ltRow)
              if (if (fwd) c >= 0 else c <= 0) {
                ans = mid
                if (fwd) hi = mid - 1 else lo = mid + 1
              } else if (fwd) lo = mid + 1 else hi = mid - 1
            }
            if (ans >= 0) {
              val cand = buf(ans)
              val ok = tol.isEmpty || {
                val dist =
                  if (fwd) timeGet(cand._2) - timeGet(ltRow)
                  else timeGet(ltRow) - timeGet(cand._2)
                dist <= tol.get
              }
              if (ok) m = cand._3
            }
          }
        }
        numOutputRows += 1
        proj(joined(l, if (m != null) m else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
