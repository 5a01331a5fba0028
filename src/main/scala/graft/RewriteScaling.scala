package graft

import org.apache.spark.sql.functions._

/** Shuffle-volume evidence for the [[plans.ApproxDistinctRewrite]]
  * rule (dev-run, `tier:"rewrite"` lines in SCALING.jsonl; prose in
  * SCALING.md).
  *
  * The rule's 100 TB claim is architectural: an exact multi-distinct
  * aggregation plans an Expand that MULTIPLIES every input row by
  * the number of distinct groups and then re-shuffles the distinct
  * keys themselves, so its exchange volume grows with the DATA;
  * the rewritten plan folds each distinct column into a fixed-size
  * HLL sketch in one partial-aggregate pass, so its exchange
  * carries (groups × sketches × partitions) rows regardless of
  * corpus size. The q130 plan spec proves the shape (Expand gone,
  * sketch agg in); these rows prove it in MEASURED shuffle records
  * and bytes, at two corpus sizes, on the same fixture query the
  * spec pins (per-event-type distinct users AND distinct events —
  * the two-distinct form that forces the Expand).
  *
  * The growth SHAPE between sf0.01 and sf0.1 is the signal: the
  * exact plan's shuffle records track the event count (Expand ×2),
  * the rewritten plan's stay within the groups×partitions constant.
  * Single measurements on a shared dev box — ratios, not seconds,
  * are the stable columns (see BENCH_NOTES on ambient spread).
  */
object RewriteScaling {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)
    val out = new StringBuilder

    def measure(sf: String, name: String, events: Long)(
        run: => Long): Unit = {
      // warm = false: rollup() is read-only, but each ARM performs
      // its own warm-up under its conf flag (the flag must be set
      // when the warm-up plan optimizes, so a shared pre-warm here
      // would warm the wrong plan for one of the two arms)
      val (result, sec) =
        ScalingLog.measured(spark, listener, warm = false)(run)
      val line =
        s"""{"tier":"rewrite","sf":"$sf","case":"$name",""" +
          s""""result":$result,"events":$events,""" +
          s""""input_records":${listener.inputRecords},""" +
          s""""shuffle_write_records":${listener.shuffleWriteRecords},""" +
          s""""shuffle_write_bytes":${listener.shuffleWriteBytes},""" +
          s""""shuffle_read_records":${listener.shuffleReadRecords},""" +
          s""""sec":${f"$sec%.3f"}}"""
      println(s"[rw] $line")
      out.append(line).append('\n')
    }

    import graft.plans.ApproxDistinctRewrite.Flag
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val events = spark.read
        .parquet(s"/root/testdata/$sf/events.parquet")
        .select("event_type", "user_id", "event_id")
      val n = events.count()
      // the q130/ApproxDistinctRewriteSpec fixture: two distinct
      // aggregates per group — the exact plan Expands every row twice
      def rollup(): Long = events.groupBy("event_type")
        .agg(countDistinct("user_id").as("u"),
          countDistinct("event_id").as("e"))
        .agg(sum("u") + sum("e")).head().getLong(0)
      // per-arm warm-up (JIT + codegen differ between the two plans)
      // so neither measured pass pays compilation
      def arm(name: String, flagOn: Boolean): Unit = {
        if (flagOn) spark.conf.set(Flag, "true")
        try { rollup(); measure(sf, name, n)(rollup()) }
        finally if (flagOn) spark.conf.unset(Flag)
      }
      arm("multi_distinct_exact", flagOn = false)
      arm("multi_distinct_rewritten", flagOn = true)
    }

    ScalingLog.replaceSlice(ScalingLog.tier("rewrite"), out.toString)
    println("[rw] SCALING.jsonl rewrite tier replaced")
    spark.stop()
  }
}
