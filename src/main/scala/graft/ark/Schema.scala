package graft.ark

import org.apache.spark.sql.types._

/** Canonical holdings schema (reference: `src/util.rs:478-494`,
  * asserted in `tests/integration.rs:72-96`).
  *
  * Two shapes exist: the 8-column canonical (all US funds and API
  * sources) and a 5-column variant for sources with no monetary data
  * (`src/util.rs:489-494`).
  */
object Schema {
  /** Typed row for the canonical 8-column shape. */
  final case class Holding(
      date: java.sql.Date,
      ticker: String,
      cusip: String,
      company: String,
      market_value: java.lang.Long,
      shares: java.lang.Long,
      share_price: java.lang.Double,
      weight: java.lang.Double)

  val canonical8: StructType = StructType(Seq(
    StructField("date", DateType),
    StructField("ticker", StringType),
    StructField("cusip", StringType),
    StructField("company", StringType),
    StructField("market_value", LongType),
    StructField("shares", LongType),
    StructField("share_price", DoubleType),
    StructField("weight", DoubleType)))

  val canonical5: StructType = StructType(Seq(
    StructField("date", DateType),
    StructField("ticker", StringType),
    StructField("cusip", StringType),
    StructField("company", StringType),
    StructField("weight", DoubleType)))

  val cols8: Seq[String] =
    Seq("date", "ticker", "cusip", "company", "market_value", "shares",
      "share_price", "weight")
  val cols5: Seq[String] = Seq("date", "ticker", "cusip", "company", "weight")
}
