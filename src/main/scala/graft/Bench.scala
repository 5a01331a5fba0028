package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared benchmark arithmetic and run plumbing — ONE definition for
  * [[Bench]] and [[ProbeDev]], so a fix to the median, the rounding
  * or the materialization pattern can't silently miss one harness.
  */
object BenchUtil {
  def med(vs: Seq[Double]): Double = {
    val s = vs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  def r4(v: Double): Double = math.rint(v * 1e4) / 1e4

  /** Time one FULL materialization of a query through the noop sink
    * (count() would let Catalyst prune projections away), clearing
    * any persisted intermediates after.
    */
  def timeNoop(spark: SparkSession, q: graft.queries.Q,
      dir: String): Double = {
    val t0 = System.nanoTime()
    q.run(spark, dir).write.format("noop").mode("overwrite").save()
    val t = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()
    t
  }
}

object Bench {

  /** Ambient-drift control probes: three fixed, DATA-INDEPENDENT
    * workloads (`spark.range` sources — immune to testdata
    * regeneration and to every battery code change) timed at the
    * start, middle and end of each measured pass. Their plans are
    * frozen by construction, so any cross-round movement in their
    * times is the ENVIRONMENT, not the engine — the in-artifact
    * control the r8–r10 drift disputes lacked: a 20% total lift with
    * flat controls is a real regression; the same lift mirrored by
    * the controls is ambient (co-tenant load, thermal, cgroup), and
    * the per-position samples show when in the session it arrived.
    *
    *  - `ctl_sched`: 2048 empty tasks — pure task-scheduling round
    *    trips (the q25-class sub-second tier's bottleneck).
    *  - `ctl_cpu`: one xxhash64+sum fold over range(120M), no
    *    exchange — whole-stage-codegen CPU throughput.
    *  - `ctl_shuffle`: range(16M) hash-aggregated to 1k groups —
    *    one fixed-size exchange, the shuffle-machinery constant.
    */
  private def controls(spark: SparkSession, cpus: Int)
      : Seq[(String, () => Unit)] = {
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    Seq(
      "ctl_sched" -> (() =>
        noop(spark.range(0, 2048, 1, 2048).select(col("id")))),
      "ctl_cpu" -> (() =>
        noop(spark.range(0, 120000000L, 1, cpus)
          .select(sum(xxhash64(col("id"))).as("h")))),
      "ctl_shuffle" -> (() =>
        noop(spark.range(0, 16000000L, 1, cpus * 2)
          .groupBy(pmod(col("id"), lit(1000)).as("k"))
          .agg(count(lit(1)).as("n"), sum(col("id")).as("s")))))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)
    // noop sink forces FULL materialization of every column (count()
    // would let Catalyst prune the projections away).
    // None marks a failed execution — a failure's (fast) elapsed time
    // must not win the min-of-N below.
    // Dev iteration knobs (unset in the driver's runs): BENCH_ONLY
    // restricts to the named queries; BENCH_EXPLAIN dumps each timed
    // query's formatted physical plan to stderr before running it.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val explain = sys.env.contains("SPARK_GRAFT_BENCH_EXPLAIN")
    def runQueries(dir: String, qs: Seq[graft.queries.Q])
        : Map[String, Option[Double]] =
      qs.filter(q => only.forall(_.contains(q.name))).map { q =>
        if (explain && dir == sfDir)
          try System.err.println(s"=== ${q.name}\n" +
            q.run(spark, dir).queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
          catch { case e: Throwable =>
            System.err.println(s"[bench] explain ${q.name} failed: $e") }
        // timing + materialization + cache clearing live in ONE
        // place (BenchUtil.timeNoop, shared with ProbeDev); this
        // wrapper only adds the battery's failure policy — a failed
        // query's (fast) elapsed time must never enter the results
        val timed =
          try Some(BenchUtil.timeNoop(spark, q, dir))
          catch { case e: Throwable =>
            System.err.println(s"[bench] ${q.name} failed: $e")
            // timeNoop clears persisted intermediates only on the
            // success path; don't let a failure's blocks leak into
            // the next query's measurement
            spark.catalog.clearCache()
            None
          }
        q.name -> timed
      }.toMap

    val ctl = controls(spark, cpus)
    // (name, pass, position, seconds) in chronological order
    val ctlSamples =
      scala.collection.mutable.Buffer[(String, Int, String, Double)]()
    def runControls(pass: Int, pos: String): Unit = ctl.foreach {
      case (name, f) =>
        val t0 = System.nanoTime()
        f()
        ctlSamples += ((name, pass, pos, (System.nanoTime() - t0) / 1e9))
    }

    // Untimed warmup at the smallest SF: JIT + codegen compilation
    // dominate cold single-shot runs; reported numbers are the true
    // wall times of the measured SF only.
    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR",
      "/root/testdata/sf0.001")
    if (new java.io.File(warmupDir).isDirectory && warmupDir != sfDir) {
      runQueries(warmupDir, graft.queries.Registry.all)
      ctl.foreach(_._2()) // JIT the control plans too, untimed
    }

    // Timed passes: `repeat` full INTERLEAVED executions (pass 1 runs
    // every query, then pass 2, ... — so a co-tenant load spike hits
    // different queries in different passes, not the same query N
    // times in a row). Headline per-query number = MINIMUM over
    // successful executions (the standard noise-robust estimator;
    // every reported number is still a complete run); the MEDIAN is
    // reported alongside so the artifact itself shows the noise floor.
    // Controls bracket each pass (start / mid / end) so ambient drift
    // is timestamped inside the artifact, outside the query totals.
    // Default 2 (was 3): the round-17 driver's 32-core battery hit its
    // wall-clock window (BENCH_r17.json rc 124) — warmup + 2 interleaved
    // passes keeps the min-of-N estimator (interleaving intact) inside
    // the window; set SPARK_GRAFT_BENCH_REPEAT=3 for the old cadence.
    // Documented in OPTIMIZATION_r18.md (measurement-methodology note).
    val repeat = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEAT", "2").toInt
    val all = graft.queries.Registry.all
    val (half1, half2) = all.splitAt(all.size / 2)
    val passes = (1 to repeat).map { p =>
      runControls(p, "start")
      val r1 = runQueries(sfDir, half1)
      runControls(p, "mid")
      val r2 = runQueries(sfDir, half2)
      runControls(p, "end")
      r1 ++ r2
    }
    val byQuery: Map[String, Seq[Double]] = passes.flatMap(_.toSeq)
      .groupMap(_._1)(_._2).map { case (k, vs) => k -> vs.flatten }
    // min/median over SUCCESSFUL executions; -1 if none succeeded
    val results = byQuery.map { case (k, vs) =>
      k -> (if (vs.isEmpty) -1.0 else vs.min) }
    val medians = byQuery.map { case (k, vs) =>
      k -> (if (vs.isEmpty) -1.0 else BenchUtil.med(vs)) }
    // Per-query values rounded to 4 decimals on the contract line:
    // raw doubles print ~17 significant digits and the 205-entry map
    // overran the driver's line capture in round 17 (BENCH_r16/r17_c8
    // both ended mid-line, `parsed: null`).
    def js(m: Map[String, Double]) =
      m.map { case (k, v) => s"\"" + k + "\":" + BenchUtil.r4(v) }
        .mkString("{", ",", "}")
    // totals over successful queries only (-1 failure markers excluded)
    val total = results.values.filter(_ >= 0).sum
    val totalMed = medians.values.filter(_ >= 0).sum
    val ctlRows = ctlSamples.map { case (n, p, pos, s) =>
      s"""{"name":"$n","pass":$p,"pos":"$pos","sec":${BenchUtil.r4(s)}}"""
    }.mkString("[", ",", "]")
    val ctlMin = js(ctlSamples.groupBy(_._1).map { case (n, rows) =>
      n -> rows.map(_._4).min })
    // THE contract line (stdout): compact — total, per-query mins,
    // median total, the ambient-control mins, sf. The per-pass control
    // samples and the full per-query MEDIAN map (the r17 line-size
    // overflow: tens of KB the driver's capture truncated mid-line)
    // go to STDERR as their own labeled JSON lines for the artifact
    // trail; the stdout line stays well under typical line-capture
    // limits.
    System.err.println(s"""{"bench_side":"controls","repeat":$repeat,"controls":$ctlRows}""")
    System.err.println(s"""{"bench_side":"queries_median","queries_median":${js(medians)}}""")
    println(s"""{"metric":"total","value":${BenchUtil.r4(total)},"unit":"sec","queries":${js(results)},"total_median":${BenchUtil.r4(totalMed)},"repeat":$repeat,"controls_min":$ctlMin,"sf":"$sfDir"}""")
    spark.stop()
  }
}
