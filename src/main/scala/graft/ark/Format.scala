package graft.ark


import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The canonical format pipeline — `dfFormat` (reference
  * `src/util.rs:153-497`).
  *
  * The reference ping-pongs eager↔lazy (~10 `.collect()` calls per
  * format); here the whole stage is ONE lazy transformation chain
  * (a single Catalyst plan, fused by WholeStageCodegen into ~1 pass
  * over the data — vs the reference's ~50 sequential columnar kernel
  * passes). The only actions are the date-format vote counts (one
  * combined aggregate), and those run only when `date` arrives as a
  * string.
  */
object Format {

  /** Literal replace-all: Polars `str.replace_all(..., literal=true)`
    * — `StringReplace`, a plain substring scan (no regex engine on the
    * ~30-step scrub hot path).
    */
  private[ark] def replaceAllLit(c: Column, pat: String, repl: String): Column =
    replace(c, lit(pat), lit(repl))

  /** Literal replace-FIRST-occurrence: Polars `str.replace(...,
    * literal=true)`. Spark's `regexp_replace` replaces all matches;
    * [[graft.functions.ReplaceFirst]] is a native codegen'd Catalyst
    * expression that references its input exactly once, so the ~50-step
    * company chain stays a linear expression tree (the round-1
    * `locate`+`overlay`+`when` formulation duplicated the input 4× per
    * step → exponential tree → OOM at plan time).
    */
  private[ark] def replaceFirstLit(c: Column, pat: String, repl: String): Column =
    graft.functions.ReplaceFirst(c, pat, repl)

  /** Exchange suffixes stripped from tickers (ref `src/util.rs:292-310`).
    * `private[graft]` so the DuckDB oracle SQL for the scrub queries is
    * generated from the same table (single source of truth).
    */
  private[graft] val tickerSuffixes: Seq[String] =
    Seq(" FP", " UQ", " UF", " UN", " UW", "/U", " CN")

  /** Ticker suffix scrub (ref `src/util.rs:292-312`): strip exchange
    * suffixes, fix the DKNN typo (first occurrence only), rtrim.
    */
  def scrubTicker(c: Column): Column = {
    val stripped = tickerSuffixes
      .foldLeft(c)((acc, p) => replaceAllLit(acc, p, ""))
    rtrim(replaceFirstLit(stripped, "DKNN", "DKNG"))
  }

  /** Company-name normalization (ref `src/util.rs:313-429`): the exact
    * replace chain, in order — order matters (e.g. `" CO"` strips
    * before `"CORPORATION"` could ever match; SURVEY.md §7.4.3).
    * `A` = replace all occurrences, `F` = first occurrence only.
    */
  private[graft] val companyChain: Seq[(Char, String, String)] = Seq(
    ('A', " PHARMACEUTICALSP", ""), ('A', " INTERNATIONAL", ""),
    ('A', " GLOBAL", ""), ('A', " SOFTWARE", ""), ('A', " Markets", ""),
    ('A', " International", ""), ('A', " AVIATION", ""),
    ('A', " COMMUNICATIONS", ""), ('A', " PHARMACEUTICALS", ""),
    ('A', " Therapeutics", ""), ('A', " THERAPEUTICS", ""),
    ('A', " TECHNOLOGIES", ""), ('A', "-A", ""), ('A', "- A", ""),
    ('A', "CL A", ""), ('A', "CLASS A", ""), ('A', "inc", ""),
    ('A', "Inc", ""), ('A', "INC", ""), ('A', "incorporated", ""),
    ('A', "Ltd", ""), ('A', "LTD", ""), ('A', "CORP", ""), ('A', " CO", ""),
    ('A', "CORPORATION", ""), ('A', "Corporation", ""), ('A', "- C", ""),
    ('A', "-", ""), ('A', ",", ""), ('A', ".", ""), ('A', " &CURITY", ""),
    ('A', " &", ""),
    ('F', "HLDGS", ""), ('F', "HOLDINGS", ""), ('F', "Holdings", ""),
    ('F', " HOLDIN", ""), ('F', "ORATION", ""), ('F', " PLC", ""),
    ('F', " AG", ""), ('F', " ADR", ""), ('F', "DR", ""), ('F', " SA", ""),
    ('F', " NV", ""), ('F', " SE", ""), ('F', " CL C", ""),
    ('F', "COINBASE GLOBAL", "COINBASE"),
    ('F', "Coinbase Global", "Coinbase"),
    ('F', "Blackdaemon", "Blockdaemon"),
    ('F', "DISCOVERY", "Dassault Systemes"),
    ('F', "Space Investment", "SpaceX"),
    ('F', "Space Exploration Technologies Corp", "SpaceX"),
    ('F', "Space Exploration Technologies Co", "SpaceX"))

  def scrubCompany(c: Column): Column =
    rtrim(companyChain.foldLeft(c) {
      case (acc, ('A', p, r)) => replaceAllLit(acc, p, r)
      case (acc, (_, p, r))   => replaceFirstLit(acc, p, r)
    })

  private def fieldType(df: DataFrame, name: String): Option[DataType] =
    df.schema.fields.find(_.name == name).map(_.dataType)

  private def is(df: DataFrame, name: String, t: DataType): Boolean =
    fieldType(df, name).contains(t)

  /** Multi-format date parse with null-rate vote (ref
    * `src/util.rs:209-238`): try `MM/dd/yyyy`, then `yyyy/MM/dd`, then
    * inferred (plain cast); accept the first whose post-parse null
    * count is ≤ height/10 (integer division). The reference picks ONE
    * format for the whole column — no per-row coalesce, which avoids
    * `01/02/2024` ambiguity.
    *
    * One combined aggregate computes all three candidate null counts
    * in a single pass (the reference runs one eager pass per
    * candidate). At 100 TB this is the one place the format stage
    * touches data — `spark.graft.dateVote.sampleFraction` (default
    * 1.0 = exact) is the scale knob (SURVEY.md §7.4.9): vote on a
    * seeded row sample instead of the full column. The chosen format
    * then applies to ALL rows; a 10%-null threshold estimated from a
    * sample is robust far past the sample error for any real corpus
    * (the formats are mutually unparseable, so the vote is near 0% or
    * near 100% per candidate). NB `df.sample(frac, seed)` is
    * deterministic only for a FIXED partition layout — the same file
    * read with different splits draws a different sample (same rate,
    * different rows). The vote's robustness argument above is what
    * makes that acceptable; a layout-independent sample would hash row
    * content instead, at the cost of evaluating md5 on every row —
    * exactly the full-column pass the knob exists to avoid.
    */
  private def parseDate(df: DataFrame): DataFrame = {
    val candidates: Seq[Column] = Seq(
      to_date(col("date"), "MM/dd/yyyy"),
      to_date(col("date"), "yyyy/MM/dd"),
      col("date").cast(DateType))
    val frac = df.sparkSession.conf
      .get("spark.graft.dateVote.sampleFraction", "1.0").toDouble
    def voteCounts(d: DataFrame) = d.select(
      count(lit(1)) +:
        candidates.map(c => count(when(c.isNull, 1))): _*).head()
    val sampled = voteCounts(
      if (frac < 1.0) df.sample(frac, seed = 42) else df)
    // an empty sample would make the ≤ height/10 threshold 0 ≤ 0 and
    // elect the first format unconditionally — fall back to the exact
    // vote instead of voting on nothing
    val counts =
      if (frac < 1.0 && sampled.getLong(0) == 0L) voteCounts(df)
      else sampled
    val height = counts.getLong(0)
    val chosen = candidates.zipWithIndex.find {
      case (_, i) => counts.getLong(i + 1) <= height / 10
    }
    chosen match {
      case Some((c, _)) => df.withColumn("date", c)
      case None         => df // all formats rejected: leave as-is (ref behavior)
    }
  }

  /** The full format pipeline (ref `src/util.rs:153-497`). Idempotent:
    * an already-canonical frame passes through unchanged — the
    * reference re-formats history every run and relies on this
    * (`util.rs:70-79`).
    */
  def dfFormat(input: DataFrame,
      dataSource: Option[DataSource] = None): DataFrame = {
    var df = dataSource match {
      case Some(ds) => SourceFormats.bySource(ds, input)
      case None     => SourceFormats.anySource(input)
    }

    // Conditional renames (ref util.rs:165-194) — including the
    // reference's guard/argument mismatches, reproduced as-is
    // (guard on `weight_($)` renames `weight_(%)`; SURVEY.md §7.4.1).
    if (df.columns.contains("market_value_($)"))
      df = df.withColumnRenamed("market_value_($)", "market_value")
    if (df.columns.contains("weight_($)"))
      df = df.withColumnRenamed("weight_(%)", "weight")
    if (df.columns.contains("market value ($)"))
      df = df.withColumnRenamed("market value ($)", "market_value")
    if (df.columns.contains("weight (%)"))
      df = df.withColumnRenamed("weight (%)", "weight")
    if (df.columns.contains("weight ($)"))
      df = df.withColumnRenamed("weight (%)", "weight")

    // Drops (ref util.rs:196-207): `fund`, `weight_rank`, empty-named
    // trailing columns from ARK CSVs' trailing comma.
    df = df.drop("fund", "weight_rank")
    if (df.columns.exists(_.isEmpty))
      df = df.select(df.columns.filter(_.nonEmpty).map(col).toSeq: _*)

    // Date parse vote — only when `date` is not already DateType
    // (ref util.rs:209-238; the reference checks `Field("date", Date)`).
    if (df.columns.contains("date") && !is(df, "date", DateType)
      && !is(df, "date", TimestampType))
      df = parseDate(df)

    // Entity-resolution rules (ref util.rs:240 → format/ticker.rs).
    df = SecurityRules(df)

    // Value-cleaning casts + string scrubs: ONE projection, all
    // schema-conditional (ref util.rs:242-429, a single with_columns).
    var exprs = Map.empty[String, Column]
    if (is(df, "weight", StringType))
      exprs += "weight" ->
        replaceFirstLit(col("weight"), "%", "").cast(DoubleType)
    if (is(df, "date", TimestampType))
      exprs += "date" -> col("date").cast(DateType)
    if (is(df, "market_value", StringType))
      exprs += "market_value" ->
        replaceAllLit(replaceFirstLit(col("market_value"), "$", ""), ",", "")
          .cast(DoubleType).cast(LongType)
    else if (is(df, "market_value", DoubleType))
      exprs += "market_value" -> col("market_value").cast(LongType)
    if (is(df, "shares", StringType))
      exprs += "shares" ->
        replaceAllLit(col("shares"), ",", "").cast(LongType)
    if (df.columns.contains("ticker"))
      exprs += "ticker" -> scrubTicker(col("ticker"))
    if (df.columns.contains("company"))
      exprs += "company" -> scrubCompany(col("company"))
    df = df.withColumns(exprs)

    // Drop rows whose date failed every parse format (ref util.rs:434).
    if (df.columns.contains("date")) df = df.filter(col("date").isNotNull)

    // Derived share_price = round(mv/shares, 2) when absent
    // (ref util.rs:437-450; HALF_UP == Polars half-away for positives).
    if (!df.columns.contains("share_price")
      && df.columns.contains("market_value"))
      df = df.withColumn("share_price",
        round(col("market_value").cast(DoubleType) /
          col("shares").cast(DoubleType), 2))

    // Type-repair casts after union (ref util.rs:452-476). Also covers
    // IntegerType: Polars' CSV reader infers small ints as i64, Spark
    // as int32 — coerce so the canonical schema (LongType) holds
    // regardless of inference dialect.
    var repairs = Map.empty[String, Column]
    if (is(df, "market_value", DoubleType) || is(df, "market_value", IntegerType))
      repairs += "market_value" -> col("market_value").cast(LongType)
    if (is(df, "shares", DoubleType) || is(df, "shares", IntegerType))
      repairs += "shares" -> col("shares").cast(LongType)
    if (is(df, "share_price", LongType))
      repairs += "share_price" -> col("share_price").cast(DoubleType)
    if (is(df, "weight", LongType) || is(df, "weight", IntegerType))
      repairs += "weight" -> col("weight").cast(DoubleType)
    df = df.withColumns(repairs)

    // Canonical positional select (ref util.rs:478-494).
    if (df.columns.contains("share_price"))
      df.select(Schema.cols8.map(col): _*)
    else if (!(df.columns.toSeq == Schema.cols5))
      df.select(Schema.cols5.map(col): _*)
    else df
  }
}
