package graft
import org.apache.spark.sql.SparkSession
object Bench {
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
    def runAll(dir: String): Map[String, Option[Double]] =
      graft.queries.Registry.all
        .filter(q => only.forall(_.contains(q.name))).map { q =>
        if (explain && dir == sfDir)
          try System.err.println(s"=== ${q.name}\n" +
            q.run(spark, dir).queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
          catch { case e: Throwable =>
            System.err.println(s"[bench] explain ${q.name} failed: $e") }
        val t0 = System.nanoTime()
        val ok =
          try {
            q.run(spark, dir).write.format("noop").mode("overwrite").save()
            true
          } catch { case e: Throwable =>
            System.err.println(s"[bench] ${q.name} failed: $e")
            false
          }
        val t = (System.nanoTime() - t0) / 1e9
        // ops may persist intermediates (e.g. the jaccard shingle
        // table); drop them so blocks never accumulate across queries
        spark.catalog.clearCache()
        q.name -> (if (ok) Some(t) else None)
      }.toMap

    // Untimed warmup at the smallest SF: JIT + codegen compilation
    // dominate cold single-shot runs; reported numbers are the true
    // wall times of the measured SF only.
    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR",
      "/root/testdata/sf0.001")
    if (new java.io.File(warmupDir).isDirectory && warmupDir != sfDir)
      runAll(warmupDir)

    // Timed passes: `repeat` full INTERLEAVED executions (pass 1 runs
    // every query, then pass 2, ... — so a co-tenant load spike hits
    // different queries in different passes, not the same query N
    // times in a row). Headline per-query number = MINIMUM over
    // successful executions (the standard noise-robust estimator;
    // every reported number is still a complete run); the MEDIAN is
    // reported alongside so the artifact itself shows the noise floor.
    val repeat = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEAT", "3").toInt
    val passes = (1 to repeat).map(_ => runAll(sfDir))
    val byQuery: Map[String, Seq[Double]] = passes.flatMap(_.toSeq)
      .groupMap(_._1)(_._2).map { case (k, vs) => k -> vs.flatten }
    // min/median over SUCCESSFUL executions; -1 if none succeeded
    def med(vs: Seq[Double]): Double = {
      val s = vs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val results = byQuery.map { case (k, vs) =>
      k -> (if (vs.isEmpty) -1.0 else vs.min) }
    val medians = byQuery.map { case (k, vs) =>
      k -> (if (vs.isEmpty) -1.0 else med(vs)) }
    def js(m: Map[String, Double]) =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // totals over successful queries only (-1 failure markers excluded)
    val total = results.values.filter(_ >= 0).sum
    val totalMed = medians.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${js(results)},"queries_median":${js(medians)},"total_median":$totalMed,"repeat":$repeat,"sf":"$sfDir"}""")
    spark.stop()
  }
}
