package graft

import org.apache.spark.sql.functions._

/** Hot-key evidence for the native as-of join (`tier:"asof_hotkey"`
  * rows in SCALING.jsonl): the operator's 100 TB claim is O(1)
  * per-key state where the window composition buffers each key's
  * whole frame — so the adversarial case is ONE key owning the whole
  * table (the single-task pathology salting cannot fix for an as-of,
  * because the match depends on every earlier row of the key).
  *
  * Fixture: all rows share key 0; right times are a deterministic
  * permutation of [0, n) (coprime multiplier — unique, so both
  * implementations are tie-free and return identical sums), left =
  * n/4 probes. Both plans shuffle everything to one task; the
  * difference measured is what happens INSIDE it: the window sorts
  * the union and runs last-non-null over an n+n/4-row buffered
  * frame; the native exec sorts each side separately and streams
  * with one candidate row of state.
  */
object AsofScaling {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)
    val out = new StringBuilder
    def measure(name: String, extra: Map[String, Any])(
        run: => Long): Unit = {
      val (result, sec) = ScalingLog.measured(spark, listener)(run)
      val extras = extra.map { case (k, v) => s""","$k":$v""" }.mkString
      val line =
        s"""{"tier":"asof_hotkey","case":"$name","result":$result,""" +
        s""""shuffle_write_records":${listener.shuffleWriteRecords},""" +
        s""""max_task_shuffle_read_records":${listener.maxTaskShuffleReadRecords},""" +
        s""""max_task_run_ms":${listener.maxTaskRunMillis},""" +
        s""""sec":${f"$sec%.3f"}$extras}"""
      println(s"[asof] $line")
      out.append(line).append('\n')
    }

    def sides(n: Long) = {
      // coprime multipliers → unique times per side (tie-free)
      val right = spark.range(n).select(lit(0L).as("k"),
        ((col("id") * 2654435761L) % n).as("t"), col("id").as("rid"))
      val left = spark.range(n / 4).select(lit(0L).as("k"),
        ((col("id") * 40503L) % n).as("t"), col("id").as("lid"))
      (left, right)
    }
    def total(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum("rid")).collect()(0).getLong(0)

    for (n <- Seq(200000L, 2000000L)) {
      val (l, r) = sides(n)
      measure(s"window_n$n", Map("rows" -> n))(
        total(graft.ops.AsOf.asofJoin(l, r, "k", "t")))
      measure(s"native_n$n", Map("rows" -> n))(
        total(graft.ops.AsOf.asofJoinNative(l, r, "k", "t")))
      // the packaged mitigation: same single monster key, pre-split
      // into 32 time slices — the `result` equality with the two
      // arms above is the correctness cross-check; the wall-clock
      // and max_task_run_ms drop is the parallelism restored
      measure(s"presplit32_n$n", Map("rows" -> n))(
        total(graft.ops.AsOf.asofJoinNativePresplit(l, r, "k", "t", 32)))
    }

    // TIME skew: one MONSTER key (8× every other key's rows) among
    // 32 keys — the case where O(1) memory is already proven but the
    // monster's serial merge bounds the stage wall-clock. AQE's
    // skew-join splitting does not apply to a custom exec, so the
    // honest claim is a measured straggler bound (max_task_run_ms vs
    // sec), native vs window, not a fix. Mitigation documented on
    // AsOfJoinExec: pre-split the monster key by time range.
    def skewSides(n: Long) = {
      def keyed(ids: org.apache.spark.sql.DataFrame) = ids.select(
        when(col("id") % 32 < 8, 0L).otherwise(col("id") % 32).as("k"),
        col("id").as("t"), col("id").as("rid"))
      (keyed(spark.range(n / 4).toDF("id")).withColumnRenamed("rid", "lid"),
        keyed(spark.range(n).toDF("id")))
    }
    for (n <- Seq(2000000L)) {
      val (l, r) = skewSides(n)
      measure(s"window_skew_n$n", Map("rows" -> n))(
        total(graft.ops.AsOf.asofJoin(l, r, "k", "t")))
      measure(s"native_skew_n$n", Map("rows" -> n))(
        total(graft.ops.AsOf.asofJoinNative(l, r, "k", "t")))
    }
    ScalingLog.replaceSlice(ScalingLog.tier("asof_hotkey"), out.toString)
    spark.stop()
  }
}
