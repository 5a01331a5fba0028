package graft.ark

import java.time.{Duration, LocalDateTime, LocalTime, ZoneOffset}
import java.util.concurrent.{Executors, TimeUnit}

import org.apache.spark.sql.SparkSession

/** Driver-side orchestration (reference `src/main.rs`): twice-daily
  * refresh of the scheduled tickers, per-ticker error isolation,
  * configurable jitter (default matches the reference's random
  * 30 min–4 h; zero for tests). Spark parallelizes *within* each
  * ticker job; concurrent tickers run from a fixed thread pool.
  */
object Scheduler {

  final case class Config(
      source: Source = Source.fromEnv(),
      tickers: Seq[Ticker] = Ticker.scheduled,
      path: Option[String] = None,
      // ref main.rs:45-47 — uniform 30 min .. 4 h
      jitterMinSec: Long = 30L * 60, jitterMaxSec: Long = 4L * 60 * 60,
      // ref main.rs:114-115 — 10:00 am and 10:00 pm daily
      runAt: Seq[LocalTime] = Seq(LocalTime.of(10, 0), LocalTime.of(22, 0)),
      startupCsvMerge: Boolean = sys.env.get("STARTUP_CSV_MERGE").contains("true"),
      startupArkEtf: Boolean = sys.env.get("STARTUP_ARK_ETF").contains("true"),
      parallelism: Int = 4,
      fetcher: Fetcher = HttpFetcher)

  /** One ticker's refresh (ref `main.rs:43-60`): jitter-sleep, ingest,
    * format, write, log shape + last row.
    */
  def arkPlan(spark: SparkSession, cfg: Config, ticker: Ticker): Unit = {
    if (cfg.jitterMaxSec > 0) {
      val sec = cfg.jitterMinSec +
        scala.util.Random.nextLong(cfg.jitterMaxSec - cfg.jitterMinSec + 1)
      Thread.sleep(sec * 1000)
    }
    val ark = Ark(spark, cfg.source, ticker, cfg.path, cfg.fetcher)
      .writeParquet()
    printDf(ticker, ark.df)
  }

  private def printDf(ticker: Ticker,
      df: org.apache.spark.sql.DataFrame): Unit = {
    // ref main.rs:18-25 — shape + tail(1)
    val n = df.count()
    println(s"Ticker: $ticker\nShape: ($n, ${df.columns.length})")
    df.tail(1).foreach(println)
  }

  /** Fan out the scheduled tickers with per-ticker error isolation
    * (ref `main.rs:62-98` — errors print and the run continues).
    */
  def arkEtf(spark: SparkSession, cfg: Config): Unit = {
    val pool = Executors.newFixedThreadPool(cfg.parallelism)
    try {
      val tasks = cfg.tickers.map { t =>
        pool.submit(new Runnable {
          override def run(): Unit =
            try arkPlan(spark, cfg, t)
            catch {
              case e: Exception =>
                System.err.println(s"Error processing ticker $t: $e")
            }
        })
      }
      tasks.foreach(_.get())
    } finally { pool.shutdown(); () }
  }

  /** Startup CSV migration (ref `main.rs:27-41`). */
  def csvMerge(spark: SparkSession, cfg: Config,
      csvRoot: String = "data/csv"): Unit =
    Ticker.all.foreach { t =>
      if (new java.io.File(s"$csvRoot/${t.name}").exists()) {
        val ark = Ark.mergeOldCsvToParquet(spark, t, cfg.path, csvRoot)
          .format.sort.writeParquet()
        printDf(t, ark.df)
      }
    }

  /** Blocking scheduler loop (ref `main.rs:100-122`). */
  def run(spark: SparkSession, cfg: Config = Config()): Unit = {
    println("Scheduler Started")
    if (cfg.startupCsvMerge) { println("Merging CSVs to Parquet"); csvMerge(spark, cfg) }
    if (cfg.startupArkEtf) arkEtf(spark, cfg)
    val exec = Executors.newScheduledThreadPool(1)
    cfg.runAt.foreach { at =>
      val now = LocalDateTime.now(ZoneOffset.UTC)
      var next = now.toLocalDate.atTime(at)
      if (!next.isAfter(now)) next = next.plusDays(1)
      val initial = Duration.between(now, next).getSeconds
      exec.scheduleAtFixedRate(
        new Runnable { override def run(): Unit = arkEtf(spark, cfg) },
        initial, 24L * 60 * 60, TimeUnit.SECONDS)
    }
    while (!exec.isTerminated) exec.awaitTermination(1, TimeUnit.SECONDS)
  }
}
