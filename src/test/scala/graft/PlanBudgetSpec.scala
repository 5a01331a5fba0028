package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Battery-wide plan-shape regression net: every batch query's
  * executed (AQE-final) plan must fit the exchange budget committed
  * in `src/test/resources/plan_budget.tsv` — shuffles, broadcasts,
  * window operators and parquet scans are all ceilings. A future
  * edit that quietly adds a shuffle, broadcasts a corpus-sized
  * frame, re-runs a kernel (extra scan) or widens a window now
  * fails `sbt test` instead of waiting for a bench round.
  *
  * The budget records plan facts at sf0.001 under the test session
  * (local[4], 4 shuffle partitions) — the same conditions this spec
  * re-derives them under, so AQE decisions are reproducible. When a
  * query's plan changes ON PURPOSE, re-record with
  * `SPARK_GRAFT_PLAN_RECORD=1 sbt "testOnly graft.PlanBudgetSpec"`
  * and review the diff like any other code change (the point is
  * that plan changes become VISIBLE, not forbidden).
  */
class PlanBudgetSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val budgetPath = Paths.get("src/test/resources/plan_budget.tsv")

  test("every batch query's executed plan fits its committed budget") {
    val batch = graft.queries.Registry.all
      .filterNot(q =>
        PlanFacts.streaming(q.name) || PlanFacts.composed(q.name))
      .sortBy(_.name)
    val planText = scala.collection.mutable.Map.empty[String, String]
    val actual = batch.map { q =>
      val df = q.run(spark, dir)
      val f = PlanFacts.of(df)
      planText(q.name) = df.queryExecution.executedPlan.toString
      spark.catalog.clearCache()
      q.name -> f
    }

    if (sys.env.contains("SPARK_GRAFT_PLAN_RECORD")) {
      val header = "# query\tshuffles\tbroadcasts\twindows\tscans\n" +
        "# Ceilings for PlanBudgetSpec, recorded at sf0.001 under the\n" +
        "# test session. Re-record: SPARK_GRAFT_PLAN_RECORD=1 sbt\n" +
        "# \"testOnly graft.PlanBudgetSpec\" — then review the diff.\n" +
        "# NOTE: q119/q53 ceilings are HAND-RAISED to their sort-merge\n" +
        "# shape (4 and 7 shuffles — q53 back at 7: the plain screen's\n" +
        "# hist evidence is an existence distinct again, not the\n" +
        "# attributed argmax window): estimates (child\n" +
        "# size PRODUCTS, no CBO) sit at the broadcast threshold at\n" +
        "# this SF, so the initial plan legitimately flips BHJ<->SMJ\n" +
        "# with byte-level store-file variation. Keep the max when\n" +
        "# re-recording from a run that happened to plan broadcasts.\n" +
        "# q136 is HAND-RAISED the same way (15 recorded -> 17): its\n" +
        "# IVFPQ/BM25 composition sits at the same threshold and was\n" +
        "# observed at 17 shuffles in a full-suite run, 15 isolated.\n"
      Files.createDirectories(budgetPath.getParent)
      Files.writeString(budgetPath, header + actual.map { case (n, f) =>
        s"$n\t${f.shuffles}\t${f.broadcasts}\t${f.windows}\t${f.scans}"
      }.mkString("", "\n", "\n"))
      info(s"recorded ${actual.size} budget rows to $budgetPath")
    }

    assert(Files.exists(budgetPath),
      s"no budget file at $budgetPath — record one with " +
        "SPARK_GRAFT_PLAN_RECORD=1")
    val budget = Files.readAllLines(budgetPath).asScala
      .filterNot(l => l.startsWith("#") || l.isBlank)
      .map { l =>
        val p = l.split("\t")
        p(0) -> (p(1).toInt, p(2).toInt, p(3).toInt, p(4).toInt)
      }.toMap

    val stale = budget.keySet -- actual.map(_._1).toSet
    val problems = stale.toSeq.sorted.map(n =>
      s"$n: budget row for a query that no longer exists — re-record") ++
      actual.flatMap { case (name, f) =>
        budget.get(name) match {
          case None =>
            Seq(s"$name: NO budget row — new query, re-record the budget")
          case Some((sh, br, wi, sc)) =>
            Seq(
              (f.shuffles > sh) ->
                s"$name: ${f.shuffles} shuffles > budget $sh",
              (f.broadcasts > br) ->
                s"$name: ${f.broadcasts} broadcasts > budget $br",
              (f.windows > wi) ->
                s"$name: ${f.windows} windows > budget $wi",
              (f.scans > sc) ->
                s"$name: ${f.scans} parquet scans > budget $sc",
            ).collect { case (true, msg) => msg }
        }
      }
    // a violation is plan-shape evidence — dump the offending plans
    // so a flaky-vs-genuine diagnosis never needs a re-run (set
    // SPARK_GRAFT_PLAN_DUMP=q1,q2 to dump specific plans regardless)
    val wanted = sys.env.get("SPARK_GRAFT_PLAN_DUMP")
      .map(_.split(",").toSet).getOrElse(Set.empty)
    val toDump = problems.map(_.takeWhile(_ != ':')).distinct ++ wanted
    if (toDump.nonEmpty) {
      val dumpDir = Paths.get("target/plan-budget-violations")
      Files.createDirectories(dumpDir)
      toDump.distinct.flatMap(n => planText.get(n).map(n -> _))
        .foreach { case (n, p) =>
          Files.writeString(dumpDir.resolve(s"$n.txt"), p) }
      info(s"plans dumped to $dumpDir")
    }
    assert(problems.isEmpty,
      s"\nplan budget violations:\n${problems.mkString("\n")}")
  }
}
