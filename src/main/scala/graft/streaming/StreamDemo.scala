package graft.streaming

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Offline end-to-end drive of the streaming rollup: stage the events
  * table as a file-source directory, stream it with
  * `Trigger.AvailableNow` (the incremental-batch trigger — the
  * streaming face of the reference's scheduled refresh), and check the
  * result against the batch rollup on the same data.
  *
  * Run: `sbt "runMain graft.streaming.StreamDemo"`.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(4)
    import spark.implicits._

    // File sources read directories: stage the single-file table.
    // Watermarks require TIMESTAMP (with local tz), not NTZ — cast at
    // staging (UTC session ⇒ identical wall-clock values).
    val stage = java.nio.file.Files.createTempDirectory("graft-stream-")
    val events = graft.queries.Registry.events(spark, sfDir)
      .withColumn("ts", col("ts").cast("timestamp"))
    events.write.mode("overwrite").parquet(s"$stage/events")

    val stream = spark.readStream
      .schema(events.schema)
      .parquet(s"$stage/events")
    val q = EventStream.hourlyRollup(stream)
      .writeStream.format("memory").queryName("rollup")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$stage/ckpt")
      .start()
    q.awaitTermination()

    val streamed = spark.table("rollup")
    val batch = EventStream.hourlyRollup(events)
    val nStream = streamed.count()
    val nBatch = batch.count()
    // Append mode withholds windows the final watermark hasn't passed;
    // everything emitted must match batch exactly.
    val mismatched = streamed.exceptAll(batch).count()
    println(s"[stream-demo] streamed=$nStream batch=$nBatch " +
      s"mismatched=$mismatched")
    streamed.orderBy(desc("h")).show(3, truncate = false)
    require(mismatched == 0, "streamed rows must be a subset of batch")
    require(nStream > 0, "stream emitted nothing")

    // Streaming dedupe drive: stage the events table duplicated 2×,
    // stream it through dropDuplicatesWithinWatermark on event_id —
    // the emitted count must equal the distinct event count.
    events.unionAll(events).write.mode("overwrite")
      .parquet(s"$stage/events_dup")
    val dq = EventStream.dedupeStream(
        spark.readStream.schema(events.schema).parquet(s"$stage/events_dup"),
        Seq("event_id"))
      .writeStream.format("memory").queryName("dedupe")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$stage/ckpt-dedupe")
      .start()
    dq.awaitTermination()
    val nDeduped = spark.table("dedupe").count()
    val nDistinct = events.select("event_id").distinct().count()
    println(s"[stream-demo] dedupe: in=${2 * events.count()} " +
      s"out=$nDeduped distinct=$nDistinct")
    require(nDeduped == nDistinct, "stream dedupe must match distinct count")
    spark.stop()
  }
}
