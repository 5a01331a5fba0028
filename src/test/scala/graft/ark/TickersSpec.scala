package graft.ark

import org.scalatest.funsuite.AnyFunSuite

/** URL construction cases (reference `src/util/ticker.rs:136-167`). */
class TickersSpec extends AnyFunSuite {
  val cases: Seq[(Ticker, String)] = Seq(
    Ticker.ARKVX ->
      "https://assets.ark-funds.com/fund-documents/funds-etf-csv/ARK_VENTURE_FUND_ARKVX_HOLDINGS.csv",
    Ticker.ARKK ->
      "https://assets.ark-funds.com/fund-documents/funds-etf-csv/ARK_INNOVATION_ETF_ARKK_HOLDINGS.csv",
    Ticker.ARKA ->
      "https://cdn.21shares-funds.com/uploads/fund-documents/us-bank/holdings/product/current/ARKA-Export.csv",
    Ticker.EUROPE_ARKI ->
      "https://europe.ark-funds.com/funds/artificial-intelligence-robotics/full-fund-holdings-download/",
    Ticker.CYBR ->
      "https://europe.ark-funds.com/funds/cybersecurity-and-data-privacy/full-fund-holdings-download/")

  for ((t, url) <- cases)
    test(s"get_url ${t.name}") { assert(t.url == url) }

  // The reference enum has 25 variants with 17 excluded from the
  // scheduled run (src/main.rs:74-93), leaving these 8.
  test("25 tickers, 8 scheduled") {
    assert(Ticker.all.size == 25)
    assert(Ticker.scheduled.map(_.name).toSet ==
      Set("ARKVX", "ARKF", "ARKG", "ARKK", "ARKQ", "ARKW", "ARKX", "IZRL"))
  }

  test("api urls per source/lastDay") {
    assert(Ark.apiUrl(Ticker.ARKK, None, Source.ApiFull) ==
      "https://api.nexveridian.com/ark_holdings?ticker=ARKK&start=2000-01-01")
    assert(Ark.apiUrl(Ticker.ARKK,
      Some(java.time.LocalDate.of(2024, 3, 15)), Source.ApiIncremental) ==
      "https://api.nexveridian.com/ark_holdings?ticker=ARKK&start=2024-03-15")
    assert(Ark.apiUrl(Ticker.ARKK,
      Some(java.time.LocalDate.of(2024, 3, 15)), Source.ArkFundsIoIncremental) ==
      "https://arkfunds.io/api/v2/etf/holdings?symbol=ARKK&date_from=2024-03-15")
    assert(Ark.apiUrl(Ticker.ARKK, Some(java.time.LocalDate.of(2024, 3, 15)),
      Source.ArkFundsIoFull) ==
      "https://arkfunds.io/api/v2/etf/holdings?symbol=ARKK&date_from=2000-01-01")
  }

  test("source from env string") {
    assert(Source.fromString("ApiIncremental") == Source.ApiIncremental)
    assert(Source.fromEnv(Map.empty) == Source.ApiIncremental)
    assertThrows[IllegalArgumentException](Source.fromString("Nope"))
  }
}
