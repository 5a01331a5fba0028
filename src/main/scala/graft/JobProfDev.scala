package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart}

/** Dev-only job-level profiler (not part of the driver contract; run
  * by hand while tuning, like [[ProbeDev]]/[[ProfileDev]]). Runs the
  * named queries once each at the probe SF and aggregates Spark job
  * wall-clock BY CALL SITE (`callSite.short`, e.g. "parquet at
  * CurationStore.scala:473"), printing the sorted per-site totals plus
  * the sum-of-jobs vs wall-clock gap — the driver-side planning /
  * staging / manifest latency the jobs never see. Because lifecycle
  * queries now overlap jobs ([[ops.TierPar]]), concurrent job time
  * can sum past wall-clock; the per-site ranking is the signal.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt -batch "runMain graft.JobProfDev q169_corpus_transaction"
  */
object JobProfDev {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val names: Seq[String] =
      if (args.nonEmpty) args.toSeq else Seq("q169_corpus_transaction")
    val byName = graft.queries.Registry.all.map(q => q.name -> q).toMap
    val unknown = names.filterNot(byName.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")

    val spark = GraftSession.local(cpus)
    val bySite = mutable.Map[String, (Double, Int)]()
    val execDesc = mutable.Map[Long, String]()
    val starts = mutable.Map[Int, (String, Long)]()
    val listener = new SparkListener {
      // attribute jobs to their SQL execution's DESCRIPTION (the
      // action call site, "parquet at CurationStore.scala:473") —
      // stage/job call sites are eaten by the async SQL-execution
      // wrapper, but the execution-start event keeps the real one
      override def onOtherEvent(
          event: org.apache.spark.scheduler.SparkListenerEvent)
          : Unit = event match {
        case e: org.apache.spark.sql.execution.ui
            .SparkListenerSQLExecutionStart => synchronized {
          execDesc(e.executionId) = e.description.takeWhile(_ != '(')
            .trim
        }
        case _ =>
      }
      override def onJobStart(js: SparkListenerJobStart): Unit =
        synchronized {
          val site = Option(js.properties)
            .flatMap(p => Option(
              p.getProperty("spark.sql.execution.id")))
            .flatMap(id => execDesc.get(id.toLong))
            .getOrElse("non-sql: " + js.stageInfos.sortBy(_.stageId)
              .lastOption.map(_.name.takeWhile(_ != '(').trim)
              .getOrElse("?"))
          starts(js.jobId) = (site, js.time)
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        synchronized {
          starts.remove(je.jobId).foreach { case (site, t0) =>
            val sec = (je.time - t0) / 1e3
            val (acc, n) = bySite.getOrElse(site, (0.0, 0))
            bySite(site) = (acc + sec, n + 1)
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR",
      "/root/testdata/sf0.001")
    if (new java.io.File(warmupDir).isDirectory && warmupDir != sfDir)
      names.foreach(n => BenchUtil.timeNoop(spark, byName(n), warmupDir))

    names.foreach { name =>
      bySite.clear()
      val wall = BenchUtil.timeNoop(spark, byName(name), sfDir)
      // drain listener events queued behind the last job
      Thread.sleep(500)
      val rows = bySite.toSeq.sortBy(-_._2._1)
      val jobSum = rows.map(_._2._1).sum
      println(f"[jobprof] $name wall=$wall%.2f s stages=${rows.map(_._2._2).sum} stageSum=$jobSum%.2f s")
      rows.takeWhile(_._2._1 >= 0.05).foreach { case (site, (sec, n)) =>
        println(f"[jobprof]   $sec%8.2f s  n=$n%-4d $site")
      }
    }
    spark.stop()
  }
}
