package graft.streaming

import java.sql.Timestamp

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming face of the engine. The reference is
  * batch-only (scheduled refresh, SURVEY.md §2.9); these operators are
  * the streaming upgrades of its merge/rollup semantics:
  *
  * - [[hourlyRollup]] — the SAME transformation works on a batch frame
  *   and a stream (Spark's unified Dataset model); with a stream it
  *   needs only the watermark for state eviction. Late/duplicate rows
  *   are handled by watermark + windowed state instead of the
  *   reference's union+distinct over full history.
  * - [[sessionize]] — custom state machine via flatMapGroupsWithState
  *   (gap-based user sessions), the pattern for anything the built-in
  *   windowed aggs can't express.
  *
  * At scale: state is partitioned by group key across executors; the
  * watermark bounds state size; `spark.sql.shuffle.partitions` sizes
  * the state store, exactly like a shuffle.
  */
object EventStream {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Session(user_id: Long, start: Timestamp, end: Timestamp,
      n_events: Long, total_value: Double)

  /** Tumbling 1-hour rollup per event type. Watermark: 2 hours. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("w.start").as("h"), col("event_type"), col("n"),
        col("total"))

  /** Gap-based sessionization via Spark's NATIVE `session_window`
    * aggregate — the Spark-first counterpart to [[sessionize]]'s
    * custom state machine (which exists for semantics the built-in
    * can't express: custom payloads, per-group logic). Same gap-merge
    * rule; the emitted window's `end` is last event + gap by
    * definition. Use this one when the session payload is a plain
    * aggregate — the built-in merges session state inside the
    * aggregation exec, no typed state API in the path.
    */
  def sessionWindowRollup(events: DataFrame,
      gapMinutes: Int = 30): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"))
      .select(col("user_id"), col("w.start").as("start"),
        col("w.end").as("end"), col("n_events"), col("total_value"))

  /** Gap-based sessionization: a session closes after `gapMinutes` of
    * inactivity (event-time timeout) and is emitted once, closed.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Event], Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId: Long, batch: Iterator[Event],
            state: GroupState[List[Event]]) =>
          if (state.hasTimedOut) {
            val evs = state.get
            state.remove()
            Iterator.single(toSession(userId, evs))
          } else {
            // full-precision order (getTime is ms; getNanos breaks
            // same-millisecond ties) so session start/end rows are
            // deterministic and match a µs-ordered SQL oracle
            val all = (state.getOption.getOrElse(Nil) ++ batch.toList)
              .sortBy(e => (e.ts.getTime, e.ts.getNanos))
            // split on gaps: all but the last run are closed sessions
            val runs = splitOnGaps(all, gapMs)
            val (closed, open) = (runs.init, runs.last)
            state.update(open)
            state.setTimeoutTimestamp(open.last.ts.getTime + gapMs)
            closed.iterator.map(toSession(userId, _))
          }
      }
  }

  private def splitOnGaps(sorted: List[Event], gapMs: Long): List[List[Event]] =
    sorted.foldLeft(List.empty[List[Event]]) {
      case (Nil, e) => List(List(e))
      case (cur :: done, e) if e.ts.getTime - cur.head.ts.getTime <= gapMs =>
        (e :: cur) :: done // cur is reversed: head = latest
      case (acc, e) => List(e) :: acc
    }.map(_.reverse).reverse

  private def toSession(userId: Long, evs: List[Event]): Session =
    Session(userId, evs.head.ts, evs.last.ts, evs.length,
      math.round(evs.map(_.value).sum * 100).toDouble / 100)

  /** Stream-static enrichment join + windowed rollup: the streaming
    * side joins a STATIC dimension (broadcast per micro-batch — no
    * state, no watermark needed for the join itself; Spark re-plans
    * the static side each batch) and the enriched rows feed the same
    * watermarked window aggregation as [[hourlyRollup]]. This is the
    * standard "enrich events with a dim table, then aggregate" shape;
    * at scale the dim broadcasts exactly like any batch dimension.
    */
  def enrichedRollup(events: DataFrame, dim: DataFrame, joinKey: String,
      dimKey: String, dimCol: String): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .join(broadcast(dim.select(col(dimKey).as(joinKey), col(dimCol))),
        joinKey)
      .groupBy(window(col("ts"), "1 hour").as("w"), col(dimCol))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(col("w.start").as("h"), col(dimCol), col("n"), col("total"))

  /** Stream-stream interval join (conversion attribution): pair each
    * `fromType` event with the same user's `toType` events that
    * follow within `maxGapMinutes`. BOTH sides are streams —
    * two-sided join state, the class q38/q40/q41's one-sided state
    * doesn't cover. The watermarks plus the time-range predicate let
    * Spark evict each side's state once the other side's watermark
    * passes the gap window — the property that makes stream-stream
    * joins viable over unbounded streams. INNER join: emissions are
    * exactly the matched pairs (the watermark governs only state
    * eviction, never emission), so the plain batch SQL join is the
    * oracle.
    */
  def conversionJoin(events: DataFrame, fromType: String, toType: String,
      maxGapMinutes: Int, joinType: String = "inner"): DataFrame = {
    val l = events.filter(col("event_type") === fromType)
      .select(col("user_id"), col("event_id").as("from_id"),
        col("ts").as("from_ts"))
      .withWatermark("from_ts", "2 hours")
    val r = events.filter(col("event_type") === toType)
      .select(col("user_id").as("to_user"), col("event_id").as("to_id"),
        col("ts").as("to_ts"), col("value"))
      .withWatermark("to_ts", "2 hours")
    l.join(r, col("user_id") === col("to_user") &&
        col("to_ts") > col("from_ts") &&
        col("to_ts") <= col("from_ts") +
          expr(s"INTERVAL $maxGapMinutes MINUTES"), joinType)
      .select(col("user_id"), col("from_id"), col("from_ts"),
        col("to_id"), col("to_ts"), col("value"))
  }

  /** Streaming dedupe — the streaming face of the reference's
    * union+distinct merge (SURVEY.md §2.6): duplicates arriving within
    * the watermark horizon are dropped exactly once; state for keys
    * older than the watermark is evicted, which is what makes this
    * viable over unbounded streams (the reference instead re-reads and
    * re-dedupes full history every run).
    */
  /** Merge-upsert one micro-batch into a versioned parquet history —
    * the reference's merge loop (read history → union batch → dedupe
    * → write, `src/util.rs:70-79,133-145` shape) as a `foreachBatch`
    * streaming sink. Each batch writes `dir/v{batchId}` from the
    * latest version BELOW it, so a replayed batch (stream restart
    * after a sink failure) rebuilds exactly the same version instead
    * of double-appending — the idempotence contract `foreachBatch`
    * asks of its sink, which a plain parquet `append` breaks. At
    * scale the same contract is met by a transactional table format;
    * the plan per batch is one union + one hash-agg dedupe, with
    * history read back from columnar parquet (never held on the
    * driver).
    *
    * Keep-FIRST semantics, matching the reference's `unique_stable`:
    * when a key recurs, the HISTORY row wins over the batch row (the
    * origin-precedence column leads the [[graft.ops.Dedup.keepFirst]]
    * ordering), so a re-delivered key with a changed payload never
    * silently rewrites settled history. WITHIN one origin, ties
    * between equal-key rows with DIFFERENT payloads resolve by a
    * deterministic payload hash (`xxhash64` over the non-key
    * columns) — so the merge is deterministic in VALUE even without
    * the exact-duplicate assumption, within a batch as well as
    * across history-vs-batch.
    *
    * Version directories resolve through the Hadoop [[FileSystem]] of
    * `dir`'s scheme (not `java.io.File`), so the sink works unchanged
    * against HDFS/S3 paths instead of silently seeing no history and
    * rebuilding from the batch alone.
    */
  def mergeBatch(batch: DataFrame, batchId: Long, dir: String,
      keys: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val fs = hadoopFs(spark, dir)
    val prev = (batchId - 1 to 0L by -1).iterator
      .map(i => new HPath(s"$dir/v$i"))
      .find(fs.exists)
    val tagged = batch.withColumn("_origin", lit(1))
    val merged = prev
      .map(p => spark.read.parquet(p.toString)
        .withColumn("_origin", lit(0)).unionByName(tagged))
      .getOrElse(tagged)
    val payload = merged.columns
      .filterNot(c => keys.contains(c) || c == "_origin")
    // xxhash64 SKIPS null inputs (a null column leaves the hash state
    // unchanged), so (null, 1) and (1, null) over same-typed columns
    // would collide and the tie-break would go nondeterministic again
    // — hash a null-discriminating JSON encoding instead
    // (ignoreNullFields=false keeps explicit `"c":null` entries).
    val tieBreak =
      if (payload.isEmpty) Nil
      else Seq(xxhash64(to_json(struct(payload.map(col): _*),
        Map("ignoreNullFields" -> "false"))).asc)
    graft.ops.Dedup.keepFirst(merged, keys,
        col("_origin").asc +: tieBreak)
      .drop("_origin")
      .write.mode("overwrite").parquet(s"$dir/v$batchId")
  }

  /** Latest history version written by [[mergeBatch]] under `dir`. */
  def latestHistory(spark: SparkSession, dir: String): DataFrame = {
    val fs = hadoopFs(spark, dir)
    val base = new HPath(dir)
    val vs = (if (fs.exists(base)) fs.listStatus(base).toSeq else Nil)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
      .map(_.getPath.getName.drop(1).toLong)
    require(vs.nonEmpty, s"no history versions under $dir")
    spark.read.parquet(s"$dir/v${vs.max}")
  }

  private def hadoopFs(spark: SparkSession, dir: String) =
    new HPath(dir).getFileSystem(spark.sessionState.newHadoopConf())

  def dedupeStream(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark(keyCols)

  /** Batch-equivalence helper: the rollup applied to a static frame
    * (what the q17 oracle checks via date_trunc).
    */
  def hourlyRollupBatch(spark: SparkSession, dir: String): DataFrame =
    hourlyRollup(graft.queries.Registry.events(spark, dir))
}
