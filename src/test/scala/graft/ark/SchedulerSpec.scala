package graft.ark

import graft.SparkSpec

/** Orchestration-layer tests (reference `src/main.rs`): per-ticker
  * fan-out with error isolation, startup CSV merge gate, zero-jitter
  * config for tests.
  */
class SchedulerSpec extends SparkSpec {

  private val csv =
    """date,fund,company,ticker,cusip,shares,"market value ($)","weight (%)",
      |03/15/2024,X,"TESLA INC",TSLA,88160R101,"100","$1,000.00",9.49%,""".stripMargin

  test("arkEtf: per-ticker isolation — one failing fetch doesn't stop the rest") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-sched-").toString
    val cfg = Scheduler.Config(
      source = Source.Ark,
      tickers = Seq(Ticker.ARKK, Ticker.ARKG, Ticker.ARKQ),
      path = Some(root),
      jitterMinSec = 0, jitterMaxSec = 0,
      parallelism = 2,
      fetcher = (url: String) =>
        if (url.contains("GENOMIC")) sys.error("boom: simulated fetch failure")
        else csv)
    Scheduler.arkEtf(spark, cfg)
    assert(new java.io.File(s"$root/ARKK.parquet").exists())
    assert(new java.io.File(s"$root/ARKQ.parquet").exists())
    assert(!new java.io.File(s"$root/ARKG.parquet").exists(),
      "failed ticker must not write")
  }

  test("scheduled ticker set matches the reference exclusion list") {
    // main.rs:74-93 — 17 of 24 excluded
    val names = Ticker.scheduled.map(_.name).toSet
    assert(names == Set("ARKVX", "ARKF", "ARKG", "ARKK", "ARKQ", "ARKW",
      "ARKX", "IZRL"), names)
  }

  test("jitter honors zero bounds (tests run without sleeping)") {
    val t0 = System.nanoTime()
    val root = java.nio.file.Files
      .createTempDirectory("graft-sched2-").toString
    Scheduler.arkPlan(spark,
      Scheduler.Config(source = Source.Ark, path = Some(root),
        jitterMinSec = 0, jitterMaxSec = 0,
        fetcher = (_: String) => csv),
      Ticker.ARKK)
    assert((System.nanoTime() - t0) / 1e9 < 60)
    assert(new java.io.File(s"$root/ARKK.parquet").exists())
  }
}
