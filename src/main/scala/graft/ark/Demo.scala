package graft.ark

import graft.GraftSession

/** Offline end-to-end smoke drive of the full pipeline (SURVEY.md
  * §7.2's minimum slice, as a runnable main): fixture CSV →
  * `Ark(Source.Ark)` ingest → format → write single-file parquet →
  * re-read → incremental JSON refresh (high-water `max(date)`) →
  * merge+dedupe → write → final state printed. No network.
  *
  * Run: `sbt "runMain graft.ark.Demo"`.
  */
object Demo {
  private val day1Csv =
    """date,fund,company,ticker,cusip,shares,"market value ($)","weight (%)",
      |03/15/2024,ARKK,"TESLA INC",TSLA,88160R101,"3,178,466","$551,546,441.20",9.49%,
      |03/15/2024,ARKK,"COINBASE GLOBAL INC -CLASS A",COIN,19260Q107,"1,337,263","$331,047,092.29",5.70%,
      |03/15/2024,ARKK,"ROCKET LAB USA INC",RKLB UW,92766K106,"5,000,000","$20,000,000.00",2.00%,
      |03/15/2024,ARKK,"Cash & Cash Equivalents",,CASHUSD000,"1","$1,000,000.00",0.50%,""".stripMargin

  private val day2Json =
    """[{"company":"TESLA INC","cusip":"88160R101","date":"2024-03-18","market_value":560000000,"share_price":176.18,"shares":3178466,"ticker":"TSLA","weight":9.55,"weight_rank":1},
      |{"company":"DRAFTKINGS INC -CL A","cusip":"26142V105","date":"2024-03-18","market_value":50000000,"share_price":40.00,"shares":1250000,"ticker":"DKNG","weight":1.20,"weight_rank":2}]"""
      .stripMargin

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val root = java.nio.file.Files
      .createTempDirectory("graft-demo-").toString
    println(s"[demo] storage root: $root")

    // Run 1: cold start from the ark-funds.com CSV snapshot source.
    val csvFetcher: Fetcher = (_: String) => day1Csv
    val run1 = Ark(spark, Source.Ark, Ticker.ARKK, Some(root), csvFetcher)
      .writeParquet()
    println(s"[demo] run1 rows=${run1.df.count()}")
    run1.df.show(10, truncate = false)

    // Run 2: incremental API refresh — fetches only date > max(date).
    val jsonFetcher: Fetcher = (url: String) => {
      println(s"[demo] incremental fetch url: $url")
      day2Json
    }
    val run2 = Ark(spark, Source.ApiIncremental, Ticker.ARKK, Some(root),
      jsonFetcher).writeParquet()
    println(s"[demo] run2 rows=${run2.df.count()}")

    // Final stored state, reference read path (Source.Read).
    val fin = Ark(spark, Source.Read, Ticker.ARKK, Some(root)).format.sort
    println("[demo] final stored holdings (date ASC, weight DESC):")
    fin.df.show(20, truncate = false)
    println(s"[demo] single-file contract: " +
      new java.io.File(Ark.parquetFile(Ticker.ARKK, Some(root))).exists())

    // Probe: EMPTY history parquet + incremental run — the null
    // max(date) case must fall back to the full-fetch window
    // (start=2000-01-01), not NPE.
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), Schema.canonical8)
    Ark.writeSingleFile(empty, Ark.parquetFile(Ticker.ARKW, Some(root)))
    val run3 = Ark(spark, Source.ApiIncremental, Ticker.ARKW, Some(root),
      jsonFetcher)
    println(s"[demo] empty-history incremental rows=${run3.df.count()}")
    spark.stop()
  }
}
