package graft

/** Isolated per-query drift probe — the repeat-N harness that
  * adjudicated the r9/r10 bench-drift disputes (BENCH_NOTES.md's q90
  * table), as a one-command entry point instead of an ad-hoc script:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt -batch "runMain graft.ProbeDev q90_ivfpq_ann q25_simhash"
  *
  * Runs ONLY the named queries (defaults to the drift-canary set the
  * r10 probe used), warmed at sf0.001 then repeated
  * `SPARK_GRAFT_PROBE_REPEAT` (default 5) times each, and prints one
  * JSON row per query: all samples, min/median (min is the
  * cross-round comparable; the min/median gap is the session's noise
  * spread), and the canonical [[PlanFacts]] counts so "the plan
  * didn't change" ships inside the same row as the timings.
  * [[Bench]]'s in-artifact controls answer "is the ENVIRONMENT
  * drifting"; this answers "did THIS query drift beyond it".
  */
object ProbeDev {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val repeat = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPEAT", "5").toInt
    val names: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else Seq("q90_ivfpq_ann", "q84_pq_ann", "q57_semdedup",
        "q25_simhash")
    val byName = graft.queries.Registry.all.map(q => q.name -> q).toMap
    val unknown = names.filterNot(byName.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")

    val spark = GraftSession.local(cpus)
    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR",
      "/root/testdata/sf0.001")
    def runOnce(name: String, dir: String): Double =
      BenchUtil.timeNoop(spark, byName(name), dir)
    if (new java.io.File(warmupDir).isDirectory && warmupDir != sfDir)
      names.foreach(runOnce(_, warmupDir))

    import BenchUtil.{med, r4}
    names.foreach { name =>
      // interleaving is Bench's job; a probe isolates, so the N
      // repeats run back to back and the MIN is the headline
      val samples = (1 to repeat).map(_ => runOnce(name, sfDir))
      // streaming queries run a state machine and composed queries
      // return a driver-built LocalTableScan — tabulating the
      // returned frame's plan would be signal-free noise (and one
      // whole extra execution), so those rows carry "plan":null
      val plan =
        if (PlanFacts.streaming(name) || PlanFacts.composed(name)) "null"
        else {
          val f = PlanFacts.of(byName(name).run(spark, sfDir))
          spark.catalog.clearCache()
          s"""{"shuffles":${f.shuffles},"broadcasts":${f.broadcasts}""" +
            s""","windows":${f.windows},"scans":${f.scans}}"""
        }
      println(s"""{"probe":"$name","sf":"$sfDir","cpus":$cpus""" +
        s""","samples":${samples.map(r4).mkString("[", ",", "]")}""" +
        s""","min":${r4(samples.min)},"median":${r4(med(samples))}""" +
        s""","plan":$plan}""")
    }
    spark.stop()
  }
}
