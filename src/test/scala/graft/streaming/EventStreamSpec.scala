package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.streaming.EventStream.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{struct, to_json, xxhash64}
import org.apache.spark.sql.streaming.OutputMode

/** Drives the streaming operators through an actual micro-batch
  * engine (MemoryStream → query → memory sink) and checks streaming =
  * batch for the rollup.
  */
class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val evs = Seq(
    Event(0, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
    Event(1, ts("2024-01-01 10:20:00"), 1, "click", 2.0),
    Event(2, ts("2024-01-01 10:55:00"), 2, "buy", 10.0),
    Event(3, ts("2024-01-01 11:10:00"), 1, "click", 4.0),
    // >30 min gap for user 1 after 11:10 → session break
    Event(4, ts("2024-01-01 12:30:00"), 1, "click", 8.0),
    Event(5, ts("2024-01-01 13:00:00"), 2, "buy", 20.0),
    // far-future event advances the watermark past all gaps
    Event(6, ts("2024-01-02 00:00:00"), 3, "click", 0.5))

  test("streaming hourly rollup equals batch rollup") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.hourlyRollup(mem.toDF())
      .writeStream.format("memory").queryName("rollup_sink")
      .outputMode(OutputMode.Append()).start()
    mem.addData(evs: _*)
    q.processAllAvailable()
    // append mode emits only watermark-closed windows; add a flush
    // batch far in the future to close the rest
    mem.addData(Event(99, ts("2024-01-05 00:00:00"), 9, "noop", 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("rollup_sink")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    val batch = EventStream.hourlyRollup(evs.toDF())
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    assert(batch.subsetOf(streamed ++ batch)) // structural sanity
    assert(streamed.intersect(batch) == streamed,
      s"streamed rows not in batch: ${streamed.diff(batch)}")
    // every batch row except the flush-window rows must be streamed
    val missing = batch.filterNot(b => streamed.contains(b) ||
      b._1.startsWith("2024-01-05") || b._1.startsWith("2024-01-02"))
    assert(missing.isEmpty, s"batch rows never emitted: $missing")
  }

  test("stream-static enrichment: dim joins per batch, rollup equals batch run") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "SEG_A"), (2L, "SEG_B"), (3L, "SEG_A"),
      (9L, "SEG_Z")).toDF("k", "seg")
    val mem = MemoryStream[Event]
    val q = EventStream.enrichedRollup(mem.toDF(), dim, "user_id", "k", "seg")
      .writeStream.format("memory").queryName("enrich_sink")
      .outputMode(OutputMode.Append()).start()
    // user 7 has NO dim row → the inner join must drop it
    mem.addData(evs :+ Event(7, ts("2024-01-01 10:30:00"), 7, "click", 500.0): _*)
    q.processAllAvailable()
    val flush = Event(99, ts("2024-01-05 00:00:00"), 9, "noop", 0.0)
    mem.addData(flush)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("enrich_sink").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    assert(!streamed.exists(_._4 >= 500.0), "dim-less user leaked through")
    assert(streamed.exists(_._2 == "SEG_A") && streamed.exists(_._2 == "SEG_B"))
    // batch equivalence: same op on a static frame emits ALL windows;
    // streamed = batch minus the flush-open windows
    val batch = EventStream.enrichedRollup(
      (evs :+ Event(7, ts("2024-01-01 10:30:00"), 7, "click", 500.0) :+ flush)
        .toDF(), dim, "user_id", "k", "seg")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    assert(streamed.intersect(batch) == streamed,
      s"streamed rows not in batch: ${streamed.diff(batch)}")
    val missing = batch.filterNot(b => streamed.contains(b) ||
      b._1.startsWith("2024-01-05") || b._1.startsWith("2024-01-02"))
    assert(missing.isEmpty, s"batch rows never emitted: $missing")
    spark.catalog.dropTempView("enrich_sink")
  }

  test("stream-stream conversion join pairs events within the gap only") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.conversionJoin(mem.toDF(), "click", "buy",
        maxGapMinutes = 30)
      .writeStream.format("memory").queryName("conv_sink")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      Event(0, ts("2024-01-01 10:00:00"), 1, "click", 0.0),
      Event(1, ts("2024-01-01 10:10:00"), 1, "buy", 5.0),   // within 30m ✓
      Event(2, ts("2024-01-01 11:00:00"), 1, "buy", 7.0),   // 60m — out
      Event(3, ts("2024-01-01 10:20:00"), 2, "buy", 9.0),   // other user
      Event(4, ts("2024-01-01 09:50:00"), 1, "buy", 3.0),   // BEFORE click
      Event(9, ts("2024-01-02 00:00:00"), 9, "noop", 0.0))  // watermark
    q.processAllAvailable()
    q.stop()
    val got = spark.table("conv_sink").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("from_id"),
        r.getAs[Long]("to_id"), r.getAs[Double]("value"))).toSet
    assert(got == Set((1L, 0L, 1L, 5.0)), s"got $got")
    spark.catalog.dropTempView("conv_sink")
  }

  test("left-outer conversion join: null rows emit only past the 2x-gap horizon") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.conversionJoin(mem.toDF(), "click", "buy",
        maxGapMinutes = 30, "left_outer")
      .writeStream.format("memory").queryName("funnel_sink")
      .outputMode(OutputMode.Append()).start()
    // The watermark nodes sit AFTER the type filters, so only click/
    // buy rows advance them; the query watermark is the MIN of the
    // two sides. Flush pair at 12:00 → both sides' watermark 10:00.
    // clickA 09:29: ts + gap = 09:59 < 10:00 → null row EMITS
    // clickB 09:31: ts + gap = 10:01 > 10:00 → state still held
    // clickC 06:00 with buy 06:10 → matched row emits regardless
    mem.addData(
      Event(0, ts("2024-01-01 09:29:00"), 1, "click", 0.0),
      Event(1, ts("2024-01-01 09:31:00"), 2, "click", 0.0),
      Event(2, ts("2024-01-01 06:00:00"), 3, "click", 0.0),
      Event(3, ts("2024-01-01 06:10:00"), 3, "buy", 5.0))
    q.processAllAvailable()
    mem.addData(
      Event(8, ts("2024-01-01 12:00:00"), 8, "click", 0.0),
      Event(9, ts("2024-01-01 12:00:00"), 9, "buy", 0.0))
    q.processAllAvailable()
    // join-state eviction uses the watermark computed from the PRIOR
    // batch — run one more batch so the 10:00 watermark takes effect
    // (the file-source queries get this from AvailableNow's no-data
    // final batch)
    mem.addData(
      Event(10, ts("2024-01-01 12:00:01"), 8, "click", 0.0),
      Event(11, ts("2024-01-01 12:00:01"), 9, "buy", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("funnel_sink").collect()
      .map(r => (r.getAs[Long]("from_id"),
        Option(r.getAs[java.lang.Long]("to_id")).map(_.toLong))).toSet
    assert(got == Set((0L, None), (2L, Some(3L))), s"got $got")
    spark.catalog.dropTempView("funnel_sink")
  }

  test("streaming dedupe drops within-watermark duplicates exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.dedupeStream(mem.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedupe_sink")
      .outputMode(OutputMode.Append()).start()
    // same event delivered three times (at-least-once upstream), plus
    // two distinct ones
    mem.addData(evs(0), evs(0), evs(1))
    q.processAllAvailable()
    mem.addData(evs(0), evs(2))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedupe_sink").collect()
      .map(_.getAs[Long]("event_id")).sorted.toSeq
    assert(ids == Seq(0L, 1L, 2L), s"got $ids")
  }

  test("native session_window agrees with the custom state machine") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.sessionWindowRollup(mem.toDF(), gapMinutes = 30)
      .writeStream.format("memory").queryName("swin_sink")
      .outputMode(OutputMode.Append()).start()
    mem.addData(evs: _*)
    q.processAllAvailable()
    mem.addData(Event(99, ts("2024-01-05 00:00:00"), 9, "noop", 0.0))
    q.processAllAvailable()
    q.stop()
    // compare on (user, start, n, total): the custom machine reports
    // end = last event, the native window end = last event + gap
    val native = spark.table("swin_sink").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("start").toString,
        r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toSet
    val mem2 = MemoryStream[Event]
    val q2 = EventStream.sessionize(mem2.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("swin_custom_sink")
      .outputMode(OutputMode.Append()).start()
    mem2.addData(evs: _*)
    q2.processAllAvailable()
    mem2.addData(Event(99, ts("2024-01-05 00:00:00"), 9, "noop", 0.0))
    q2.processAllAvailable()
    q2.stop()
    val custom = spark.table("swin_custom_sink").as[Session].collect()
      .map(s => (s.user_id, s.start.toString, s.n_events, s.total_value))
      .toSet
    assert(native == custom,
      s"native-only: ${native.diff(custom)}; custom-only: ${custom.diff(native)}")
    spark.catalog.dropTempView("swin_sink")
    spark.catalog.dropTempView("swin_custom_sink")
  }

  test("sessionize splits on inactivity gaps") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("session_sink")
      .outputMode(OutputMode.Append()).start()
    mem.addData(evs: _*)
    q.processAllAvailable()
    mem.addData(Event(99, ts("2024-01-05 00:00:00"), 9, "noop", 0.0))
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("session_sink").as[Session]
      .collect().map(s => (s.user_id, s.start.toString, s.n_events,
        s.total_value)).toSet
    // user 1: (10:05,10:20) then 10:55+11:10? gap 10:20→11:10 is 50min →
    // sessions [10:05,10:20] n=2 v=3.0, [11:10] n=1 v=4.0, [12:30] n=1 v=8.0
    assert(sessions.contains((1L, "2024-01-01 10:05:00.0", 2L, 3.0)),
      s"got: $sessions")
    assert(sessions.contains((1L, "2024-01-01 11:10:00.0", 1L, 4.0)))
    assert(sessions.contains((1L, "2024-01-01 12:30:00.0", 1L, 8.0)))
    // user 2: 10:55 and 13:00 are separate sessions
    assert(sessions.contains((2L, "2024-01-01 10:55:00.0", 1L, 10.0)))
    assert(sessions.contains((2L, "2024-01-01 13:00:00.0", 1L, 20.0)))
  }

  test("mergeBatch versions accumulate and a replayed batch is idempotent") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-merge-hist").toString
    try {
      val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      val b1 = Seq((2L, "b"), (3L, "c")).toDF("id", "v") // 2 is a dup
      EventStream.mergeBatch(b0, 0L, dir, Seq("id"))
      EventStream.mergeBatch(b1, 1L, dir, Seq("id"))
      def latest = EventStream.latestHistory(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(latest == Set((1L, "a"), (2L, "b"), (3L, "c")))
      // replay batch 1 (sink failure → restart): v1 rebuilds from v0,
      // NOT from itself — no double-append, history unchanged
      EventStream.mergeBatch(b1, 1L, dir, Seq("id"))
      assert(latest == Set((1L, "a"), (2L, "b"), (3L, "c")))
      assert(spark.read.parquet(s"$dir/v1").count() == 3)
      // keep-first: a re-delivered key with a CHANGED payload does not
      // rewrite settled history — the history row wins
      val b2 = Seq((1L, "a-CHANGED"), (4L, "d")).toDF("id", "v")
      EventStream.mergeBatch(b2, 2L, dir, Seq("id"))
      assert(latest ==
        Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    } finally {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      Files.walk(Path.of(dir)).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  test("streamed as-of enrichment equals the batch as-of on the " +
      "replayed input (q147 == q145, frame-identical)") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.queries.StreamQueries.q147.run(spark, dir)
      .collect().map(_.toString).toSet
    val batch = graft.queries.Relational.q145.run(spark, dir)
      .collect().map(_.toString).toSet
    assert(streamed == batch,
      s"streamed enrichment diverges from the batch as-of: " +
        s"extra=${(streamed -- batch).take(3)} " +
        s"missing=${(batch -- streamed).take(3)}")
    assert(streamed.nonEmpty)
  }

  test("streamed ANN serving equals the batch search from the same " +
      "stored index (q155 == q148, frame-identical)") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.queries.StreamQueries.q155.run(spark, dir)
      .collect().map(_.toString).toSet
    val batch = graft.queries.SimilarityQueries.q148.run(spark, dir)
      .collect().map(_.toString).toSet
    assert(streamed == batch,
      s"streamed serving diverges from the batch search: " +
        s"extra=${(streamed -- batch).take(3)} " +
        s"missing=${(batch -- streamed).take(3)}")
    assert(streamed.nonEmpty)
  }

  test("mergeBatch tie-break discriminates which columns are null") {
    // (null, x) vs (x, null) must NOT collide: a bare xxhash64 over
    // the payload columns skips null inputs, hashing both rows to the
    // same value and leaving the within-batch winner to partition
    // order. The JSON-encoded hash keeps explicit nulls, so the
    // winner is a pure function of the VALUES.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-merge-nulls").toString
    try {
      val batch = Seq((1L, Option.empty[String], Option("x")),
        (1L, Option("x"), Option.empty[String])).toDF("id", "a", "b")
      EventStream.mergeBatch(batch, 0L, dir, Seq("id"))
      // expected winner: min JSON-encoded hash, computed independently
      val expected = batch
        .withColumn("_h", xxhash64(to_json(struct($"a", $"b"),
          Map("ignoreNullFields" -> "false"))))
        .orderBy($"_h".asc).drop("_h")
        .collect().head
      val hashes = batch
        .select(xxhash64(to_json(struct($"a", $"b"),
          Map("ignoreNullFields" -> "false"))))
        .collect().map(_.getLong(0))
      assert(hashes.distinct.length == 2,
        "JSON-encoded hashes must differ for null-position twins")
      val kept = EventStream.latestHistory(spark, dir).collect()
      assert(kept.length == 1)
      assert(kept.head.toSeq == expected.toSeq)
    } finally {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      Files.walk(Path.of(dir)).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }
}
