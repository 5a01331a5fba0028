package graft.ark

import org.apache.spark.sql.types.{DateType, DoubleType, LongType, StringType}

/** Opt-in LIVE schema smoke — the Spark counterpart of the
  * reference's live integration tests (`tests/integration.rs:7-137`):
  * fetch one ticker from the real endpoint, assert the RAW column
  * contract, format, assert the canonical schema. Excluded from
  * `sbt test` exactly as the reference's nextest filter excludes its
  * live tests from CI — the build environment has zero egress, so
  * this main exists for a NETWORKED deployment to catch provider
  * schema drift (the first thing a real operator would hit).
  *
  * Usage:
  * {{{
  *   GRAFT_LIVE_SMOKE=1 sbt "runMain graft.ark.LiveSmoke ARKK"
  * }}}
  * Exits 0 on contract match, 1 on drift, 2 when the gate flag is
  * absent (so an accidental CI invocation fails loudly, not silently
  * green).
  */
object LiveSmoke {

  /** Raw API columns (`tests/integration.rs:17-27`); `weight_rank`
    * is optional — the endpoint drops it on some dates.
    */
  private val rawExpected = Seq("company", "cusip", "date",
    "market_value", "share_price", "shares", "ticker", "weight",
    "weight_rank")

  /** The full contract as (check, ok, detail) rows — shared by the
    * live main and the offline spec that pins the assertions to the
    * fixture payloads (so the contract logic itself is CI-covered
    * even though the fetch isn't).
    */
  def checkContract(raw: org.apache.spark.sql.DataFrame)
      : Seq[(String, Boolean, String)] = {
    val rawCols = raw.columns.sorted.toSeq
    val rawOk = rawCols == rawExpected ||
      rawCols == rawExpected.filterNot(_ == "weight_rank")
    val formatted = Format.dfFormat(raw)
    val schemaOk =
      formatted.columns.toSeq == Schema.cols8 &&
        formatted.schema.fields.map(_.dataType).toSeq == Seq(
          DateType, StringType, StringType, StringType,
          LongType, LongType, DoubleType, DoubleType)
    val n = formatted.count()
    Seq(
      ("raw columns", rawOk, s"got ${rawCols.mkString(",")}"),
      ("formatted schema", schemaOk, formatted.schema.simpleString),
      ("row count > 0", n > 0, s"n=$n"))
  }

  def main(args: Array[String]): Unit = {
    if (!sys.env.get("GRAFT_LIVE_SMOKE").contains("1")) {
      System.err.println(
        "[live-smoke] refusing to run: set GRAFT_LIVE_SMOKE=1 " +
          "(this main performs real HTTP fetches)")
      sys.exit(2)
    }
    val name = args.headOption.getOrElse("ARKK")
    val ticker = Ticker.all.find(_.name == name).getOrElse {
      System.err.println(s"[live-smoke] unknown ticker $name; " +
        s"known: ${Ticker.all.map(_.name).mkString(",")}")
      sys.exit(2); throw new IllegalStateException
    }
    val spark = graft.GraftSession.local(4)
    try {
      // the reference smoke's fixed start date (integration.rs:15)
      val raw = Ark.getApi(spark, ticker,
        Some(java.time.LocalDate.of(2023, 5, 18)),
        Source.ApiIncremental, HttpFetcher)
      val results = checkContract(raw)
      results.foreach { case (what, ok, detail) =>
        println(s"[live-smoke] $what: ${if (ok) "OK" else s"DRIFT — $detail"}")
      }
      if (!results.forall(_._2)) sys.exit(1)
      println(s"[live-smoke] ${ticker.name}: contract holds")
    } finally spark.stop()
  }
}
