package graft.ark

/** Domain enums: ETF tickers, provider families, ingest modes.
  * Semantics from reference `src/util/ticker.rs:4-133` and
  * `src/util.rs:19-34` (re-expressed as Scala sealed ADTs).
  */
sealed trait DataSource
object DataSource {
  case object ArkVenture extends DataSource
  case object Ark extends DataSource
  case object Shares21 extends DataSource
  case object ArkEurope extends DataSource
  case object Rize extends DataSource
}

/** Ingest mode, selected via env `ARK_SOURCE` (ref `src/main.rs:12-16`). */
sealed trait Source
object Source {
  case object Read extends Source
  case object Ark extends Source
  case object ApiIncremental extends Source // default
  case object ApiFull extends Source
  case object ArkFundsIoIncremental extends Source
  case object ArkFundsIoFull extends Source

  val default: Source = ApiIncremental

  def fromString(s: String): Source = s match {
    case "Read"                  => Read
    case "Ark"                   => Ark
    case "ApiIncremental"        => ApiIncremental
    case "ApiFull"               => ApiFull
    case "ArkFundsIoIncremental" => ArkFundsIoIncremental
    case "ArkFundsIoFull"        => ArkFundsIoFull
    case other =>
      throw new IllegalArgumentException(
        s"Env string ARK_SOURCE is not in enum Source: $other")
  }

  def fromEnv(env: Map[String, String] = sys.env.toMap): Source =
    env.get("ARK_SOURCE").map(fromString).getOrElse(default)
}

/** The 24 ETF tickers (ref `src/util/ticker.rs:13-46`). `name` is the
  * display/identifier string; `value` the URL path fragment
  * (`ticker.rs:50-83`); `dataSource` the provider family
  * (`ticker.rs:86-110`); `url` the holdings-download URL
  * (`ticker.rs:113-133`).
  */
sealed abstract class Ticker(val name: String, val value: String) {
  import DataSource._
  import Ticker._

  def dataSource: DataSource = this match {
    case ARKVX => ArkVenture
    case ARKF | ARKG | ARKK | ARKQ | ARKW | ARKX | PRNT | IZRL => Ark
    case ARKA | ARKZ | ARKC | ARKD | ARKY | ARKB => Shares21
    case EUROPE_ARKI | EUROPE_ARKG | EUROPE_ARKK => ArkEurope
    case CYBR | CYCL | FOOD | LIFE | LUSA | NFRA | PMNT => Rize
  }

  def url: String = dataSource match {
    case ArkVenture =>
      s"https://assets.ark-funds.com/fund-documents/funds-etf-csv/$value"
    case Ark =>
      s"https://assets.ark-funds.com/fund-documents/funds-etf-csv/ARK_${value}_ETF_${name}_HOLDINGS.csv"
    case Shares21 =>
      s"https://cdn.21shares-funds.com/uploads/fund-documents/us-bank/holdings/product/current/$value-Export.csv"
    case ArkEurope | Rize =>
      s"https://europe.ark-funds.com/funds/$value/full-fund-holdings-download/"
  }

  override def toString: String = name
}

object Ticker {
  case object ARKVX extends Ticker("ARKVX", "ARK_VENTURE_FUND_ARKVX_HOLDINGS.csv")

  case object ARKF extends Ticker("ARKF", "ARK_BLOCKCHAIN_&_FINTECH_INNOVATION")
  case object ARKG extends Ticker("ARKG", "GENOMIC_REVOLUTION")
  case object ARKK extends Ticker("ARKK", "INNOVATION")
  case object ARKQ extends Ticker("ARKQ", "AUTONOMOUS_TECH._&_ROBOTICS")
  case object ARKW extends Ticker("ARKW", "NEXT_GENERATION_INTERNET")
  case object ARKX extends Ticker("ARKX", "ARK_SPACE_&_DEFENSE_INNOVATION")

  case object ARKA extends Ticker("ARKA", "ARKA")
  case object ARKZ extends Ticker("ARKZ", "ARKZ")
  case object ARKC extends Ticker("ARKC", "ARKC")
  case object ARKD extends Ticker("ARKD", "ARKD")
  case object ARKY extends Ticker("ARKY", "ARKY")
  case object ARKB extends Ticker("ARKB", "21SHARES_BITCOIN")

  case object PRNT extends Ticker("PRNT", "THE_3D_PRINTING")
  case object IZRL extends Ticker("IZRL", "ISRAEL_INNOVATIVE_TECHNOLOGY")

  case object EUROPE_ARKI extends Ticker("EUROPE_ARKI", "artificial-intelligence-robotics")
  case object EUROPE_ARKG extends Ticker("EUROPE_ARKG", "genomic-revolution")
  case object EUROPE_ARKK extends Ticker("EUROPE_ARKK", "innovation")

  case object CYBR extends Ticker("CYBR", "cybersecurity-and-data-privacy")
  case object CYCL extends Ticker("CYCL", "circular-economy-enablers")
  case object FOOD extends Ticker("FOOD", "sustainable-future-of-food")
  case object LIFE extends Ticker("LIFE", "environmental-impact-100")
  case object LUSA extends Ticker("LUSA", "usa-environmental-impact")
  case object NFRA extends Ticker("NFRA", "global-sustainable-infrastructure")
  case object PMNT extends Ticker("PMNT", "digital-payments-economy")

  val all: Seq[Ticker] = Seq(
    ARKVX, ARKF, ARKG, ARKK, ARKQ, ARKW, ARKX,
    ARKA, ARKZ, ARKC, ARKD, ARKY, ARKB,
    PRNT, IZRL,
    EUROPE_ARKI, EUROPE_ARKG, EUROPE_ARKK,
    CYBR, CYCL, FOOD, LIFE, LUSA, NFRA, PMNT)

  /** Tickers processed per scheduled run (ref `src/main.rs:74-93`
    * exclusion list — 7 of 24 remain).
    */
  val scheduled: Seq[Ticker] = all.filterNot(Set[Ticker](
    ARKA, ARKC, ARKD, ARKY, ARKZ, ARKB, PRNT,
    EUROPE_ARKI, EUROPE_ARKG, EUROPE_ARKK,
    CYBR, CYCL, FOOD, LIFE, LUSA, NFRA, PMNT))

  def fromString(s: String): Option[Ticker] = all.find(_.name == s)
}
