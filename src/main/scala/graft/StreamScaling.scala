package graft

import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.mutable.ArrayBuffer

/** Streaming scaling-evidence generator — the streaming companion to
  * [[Scaling]] (dev-run, lines appended to SCALING.jsonl): executes
  * the streaming tier at two input volumes (sf0.01 → sf0.1 = 10×
  * events over the SAME 30-day window, 10× users) and records, from
  * `StreamingQueryProgress`, total input rows, trigger count, and the
  * PEAK state-store row/memory footprint.
  *
  * The claim under test: state volume tracks the KEY space, not the
  * batch size — windowed rollups (q40/q58/q107: window × type keys)
  * hold state ~flat at 10× input, while keyed session/join state
  * (q38/q66/q68/q69) grows with the 10× user count. Either way state
  * stays orders of magnitude below input volume — the property that
  * makes the watermarked designs viable over unbounded streams.
  */
object StreamScaling {

  private class ProgressCapture extends StreamingQueryListener {
    // (inputRows, stateRows, stateMemBytes) per progress event
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
    val capture = new ProgressCapture
    spark.streams.addListener(capture)
    val all = graft.queries.StreamQueries.qs
    val qs = if (args.isEmpty) all
             else all.filter(q => args.contains(q.name))
    val out = new StringBuilder
    for (sf <- Seq("sf0.01", "sf0.1"); q <- qs) {
      capture.reset()
      val t0 = System.nanoTime()
      q.run(spark, s"/root/testdata/$sf").write
        .format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // progress events are delivered async on the listener bus
      org.apache.spark.sql.graft.Shims.flushListenerBus(spark.sparkContext)
      Thread.sleep(200)
      val evs = capture.snapshot()
      val line =
        s"""{"sf":"$sf","query":"${q.name}","tier":"streaming",""" +
        s""""input_rows":${evs.map(_._1).sum},""" +
        s""""triggers":${evs.count(_._1 > 0)},""" +
        s""""state_rows_peak":${if (evs.isEmpty) 0 else evs.map(_._2).max},""" +
        s""""state_mem_peak_bytes":${if (evs.isEmpty) 0 else evs.map(_._3).max},""" +
        s""""sec":${f"$sec%.3f"}}"""
      println(s"[stream-scaling] $line")
      out.append(line).append('\n')
      spark.catalog.clearCache()
    }
    if (args.isEmpty)
      // Scaling (batch tier) owns the file's head; this main owns the
      // streaming lines. Full regen = run Scaling, then this.
      ScalingLog.replaceSlice(ScalingLog.tier("streaming"), out.toString)
    spark.stop()
  }
}
