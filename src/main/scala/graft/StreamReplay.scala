package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}
import scala.collection.mutable.ArrayBuffer

/** Multi-batch streaming replay evidence (dev-run,
  * `tier:"streaming_replay"` lines appended to SCALING.jsonl).
  *
  * [[StreamScaling]]'s AvailableNow harness delivers the whole
  * corpus as ONE batch, so join/dedupe state there shows the
  * documented worst case: everything inside a watermark that never
  * advanced mid-run. This main replays the SAME corpus as N
  * time-ordered micro-batches — slice the events table by event
  * time, drop one slice into the watched directory per run, restart
  * the query on its checkpoint (the Trigger.AvailableNow-per-cron-
  * tick production pattern) — and records the state-store row count
  * after every batch.
  *
  * The claim measured: with the watermark ADVANCING between batches,
  * state PLATEAUS at the trailing horizon (keys/windows/join rows
  * inside ~2 h of the frontier) while cumulative input grows
  * linearly. Run at two cadences (default 5 and 10 batches) so the
  * plateau is visible at more than one batch size.
  */
object StreamReplay {

  private class ProgressCapture extends StreamingQueryListener {
    val buf = ArrayBuffer.empty[(Long, Long, Long)]
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = synchronized {
      val p = e.progress
      val st = p.stateOperators
      buf += ((p.numInputRows,
        if (st == null) 0L else st.map(_.numRowsTotal).sum,
        if (st == null) 0L else st.map(_.memoryUsedBytes).sum))
    }
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    def reset(): Unit = synchronized { buf.clear() }
    def snapshot(): Seq[(Long, Long, Long)] = synchronized { buf.toSeq }
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // slices cut on epoch-nanos longs (EventTs normalizes whatever
    // shape the generator wrote); the stream rebuilds the timestamp
    // as the battery's eventsStream does
    val raw = graft.queries.EventTs.toNanosLong(
      spark.read.parquet(s"$dir/events.parquet"))
    val (lo, hi) = raw.agg(min("ts"), max("ts")).as[(Long, Long)].head()

    val capture = new ProgressCapture
    spark.streams.addListener(capture)
    val out = new StringBuilder

    val probes: Seq[(String, DataFrame => org.apache.spark.sql.Dataset[_])] =
      Seq(
        "hourly_rollup" -> (ev =>
          graft.streaming.EventStream.hourlyRollup(ev)),
        "dedupe" -> (ev =>
          graft.streaming.EventStream.dedupeStream(ev, Seq("event_id"))),
        "interval_join" -> (ev =>
          graft.streaming.EventStream.conversionJoin(
            ev, "click", "purchase", maxGapMinutes = 30)),
        "session_window" -> (ev =>
          graft.streaming.EventStream.sessionWindowRollup(ev)))

    val cadences = if (args.isEmpty) Seq(5, 10) else args.map(_.toInt).toSeq
    for (batches <- cadences; (name, build) <- probes) {
      val watchDir =
        java.nio.file.Files.createTempDirectory(s"graft-replay-$name")
      val ckptDir =
        java.nio.file.Files.createTempDirectory(s"graft-replay-ckpt-$name")
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions",
        spark.conf.get("spark.graft.stream.shufflePartitions", "8"))
      val stateEnd = ArrayBuffer.empty[Long]
      val statePeak = ArrayBuffer.empty[Long]
      val inputCum = ArrayBuffer.empty[Long]
      val t0 = System.nanoTime()
      try {
        for (b <- 0 until batches) {
          val sliceLo = lo + (hi - lo + 1) * b / batches
          val sliceHi = lo + (hi - lo + 1) * (b + 1) / batches
          raw.filter(col("ts") >= sliceLo && col("ts") < sliceHi)
            .write.mode("append").parquet(watchDir.toString)
          capture.reset()
          val stream = spark.readStream.schema(raw.schema)
            .parquet(watchDir.toString)
            .withColumn("ts",
              expr("cast(timestamp_micros(ts div 1000) as timestamp)"))
          build(stream).writeStream.format("noop")
            .option("checkpointLocation", ckptDir.toString)
            .trigger(Trigger.AvailableNow())
            .start()
            .awaitTermination()
          org.apache.spark.sql.graft.Shims
            .flushListenerBus(spark.sparkContext)
          Thread.sleep(200)
          val evs = capture.snapshot()
          inputCum += (inputCum.lastOption.getOrElse(0L) +
            evs.map(_._1).sum)
          stateEnd += evs.lastOption.map(_._2).getOrElse(0L)
          statePeak += (if (evs.isEmpty) 0L else evs.map(_._2).max)
        }
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        Seq(watchDir, ckptDir).foreach { p =>
          import scala.jdk.CollectionConverters._
          if (java.nio.file.Files.exists(p))
            scala.util.Using.resource(java.nio.file.Files.walk(p)) { st =>
              st.iterator().asScala.toSeq.sortBy(-_.getNameCount)
                .foreach(java.nio.file.Files.deleteIfExists(_))
            }
        }
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val line =
        s"""{"tier":"streaming_replay","query":"$name","batches":$batches,""" +
        s""""input_rows_cum":[${inputCum.mkString(",")}],""" +
        s""""state_rows_end":[${stateEnd.mkString(",")}],""" +
        s""""state_rows_peak":[${statePeak.mkString(",")}],""" +
        s""""sec":${f"$sec%.3f"}}"""
      println(s"[replay] $line")
      out.append(line).append('\n')
    }

    // other generators own their tiers' lines
    ScalingLog.replaceSlice(
      ScalingLog.tier("streaming_replay"), out.toString)
    spark.stop()
  }
}
