package graft.ark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-source schema normalizers (reference
  * `src/util/format/data_source.rs`). Each is schema-conditional:
  * it inspects `df.columns` at runtime (driver-side control flow,
  * not a plan-level rule) and is a no-op when its guard column set
  * is absent — so the full chain is safe to apply to any frame.
  */
object SourceFormats {

  /** Europe "today" stamp. The reference stamps local-now
    * (`data_source.rs:98,144` uses `chrono::Local::now()`); we pin
    * UTC to match the session timezone — documented deviation
    * (SURVEY.md §7.4.7). Injectable for tests.
    */
  def today(): java.sql.Date =
    java.sql.Date.valueOf(java.time.LocalDate.now(java.time.ZoneOffset.UTC))

  private def renameAll(df: DataFrame, pairs: (String, String)*): DataFrame =
    pairs.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }

  private def padNullMonetary(df: DataFrame): DataFrame = df
    .withColumn("market_value", lit(null).cast(LongType))
    .withColumn("shares", lit(null).cast(LongType))
    .withColumn("share_price", lit(null).cast(DoubleType))

  /** ref `data_source.rs:20-58` — 21Shares export shape. */
  def format21Shares(df: DataFrame): DataFrame =
    if (!df.columns.contains("Weightings")) df
    else renameAll(df,
      "Date" -> "date", "StockTicker" -> "ticker", "CUSIP" -> "cusip",
      "SecurityName" -> "company", "Shares" -> "shares",
      "Price" -> "share_price", "MarketValue" -> "market_value",
      "Weightings" -> "weight")
      .drop("Account", "NetAssets", "SharesOutstanding", "CreationUnits",
        "MoneyMarketFlag")

  /** ref `data_source.rs:60-83` — ARK Venture (ARKVX) CSV. */
  def formatArkvx(df: DataFrame): DataFrame = {
    val renamed =
      if (df.columns.contains("CUSIP"))
        renameAll(df, "CUSIP" -> "cusip", "weight (%)" -> "weight")
      else df
    val cols = renamed.columns
    if (!cols.contains("market value ($)") && !cols.contains("market_value"))
      padNullMonetary(renamed)
    else renamed
  }

  /** ref `data_source.rs:85-108` — Europe direct CSV, clean variant. */
  def formatEurope(df: DataFrame, now: java.sql.Date = today()): DataFrame =
    if (!df.columns.contains("Currency")) df
    else padNullMonetary(
      renameAll(df.drop("Currency"),
        "name" -> "company", "ISIN" -> "cusip", "Weight" -> "weight")
        .withColumn("date", lit(now))
        .withColumn("ticker", lit(null).cast(StringType)))

  /** ref `data_source.rs:110-131` — arkfunds.io Europe JSON (exact
    * column-set guard, including order).
    */
  def formatEuropeArkfundsIo(df: DataFrame): DataFrame =
    if (!df.columns.sameElements(
        Array("company", "cusip", "date", "fund", "weight", "weight_rank"))) df
    else padNullMonetary(
      df.drop("fund", "weight_rank")
        .withColumn("ticker", lit(null).cast(StringType)))

  /** ref `data_source.rs:133-154` — Europe full-holdings download with
    * a malformed header (duplicate empty names) and 2 junk data rows.
    *
    * The junk-row skip is row-order-dependent; the reference slices
    * rows 2.. of an in-memory frame. Spark file reads only preserve
    * order per input split, so callers must pre-slice the raw text
    * (see [[DataReader.csvBytesToDf]] which tags `_row_idx` on parse).
    * Here we guard on the `_duplicated_0` marker column produced by
    * the duplicate-header repair and use the parse-order index.
    */
  def formatEuropeCsv(df: DataFrame, now: java.sql.Date = today()): DataFrame =
    if (!df.columns.contains("_duplicated_0")) df
    else {
      val ordered =
        if (df.columns.contains(DataReader.RowIdx))
          df.orderBy(col(DataReader.RowIdx)).offset(2).drop(DataReader.RowIdx)
        else df.offset(2)
      // Positional rename of whatever the 3 surviving columns are
      // (ref `data_source.rs:142` renames by position).
      val renamed = ordered.toDF("company", "cusip", "weight")
      padNullMonetary(renamed
        .withColumn("date", lit(now))
        .withColumn("ticker", lit(null).cast(StringType)))
    }

  /** Dispatch by provider family (ref `data_source.rs:6-18`). */
  def bySource(ds: DataSource, df: DataFrame): DataFrame = ds match {
    case DataSource.ArkVenture => formatArkvx(df)
    case DataSource.Ark        => df
    case DataSource.Shares21   => format21Shares(df)
    case DataSource.ArkEurope | DataSource.Rize =>
      formatEurope(formatEuropeArkfundsIo(formatEuropeCsv(df)))
  }

  /** The "try every source shape" chain used when the source is
    * unknown (ref `src/util.rs:158-162`).
    */
  def anySource(df: DataFrame): DataFrame =
    formatEurope(formatArkvx(format21Shares(
      formatEuropeArkfundsIo(formatEuropeCsv(df)))))
}
