package graft.ark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pipeline state object (reference `src/util.rs:37-41`): a frame plus
  * its ticker and optional storage root, with builder-style methods
  * (`Ark(source, ticker).format.sort.writeParquet`).
  *
  * Spark is always lazy, so the reference's eager/lazy `DF` duality
  * collapses: the whole refresh is ONE Catalyst plan with exactly
  * three actions per run — the `max(date)` high-water lookup, the
  * date-format vote (when input dates are strings), and the write
  * (SURVEY.md §3.1).
  */
final case class Ark(df: DataFrame, ticker: Ticker, path: Option[String]) {
  private def spark = df.sparkSession

  /** Re-run the canonical format (idempotent; ref `util.rs:147-151`). */
  def format: Ark = copy(df = Format.dfFormat(df))

  /** Global sort: date ASC, weight DESC (ref `util.rs:121-131`).
    * Spark's SortExec range-partitions and can spill — at scale this
    * is the total-order-before-single-file step; the partitioned-write
    * path skips it (sort within partitions instead).
    */
  def sort: Ark = copy(df = Ark.dfSort(df))

  def collect(): Array[org.apache.spark.sql.Row] = df.collect()

  /** Format, then write ONE parquet file `{root}/{ticker}.parquet` —
    * the reference's on-disk contract: full overwrite of entire
    * history each run (`util.rs:88-108`). Single-file output is
    * inherently anti-scale (`coalesce(1)`); the 100 TB path is
    * [[writeParquetPartitioned]].
    */
  def writeParquet(): Ark = {
    val formatted = format
    val root = path.getOrElse("data/parquet")
    val target = s"$root/${ticker.name}.parquet"
    Ark.writeSingleFile(formatted.df, target)
    // Re-point the returned lineage at the file just written: the
    // incremental path overwrites the SAME file the lazy plan still
    // scans (the reference materializes eagerly before writing, so it
    // never sees its own overwrite; a lazy plan would).
    copy(df = spark.read.parquet(target))
  }

  /** Scale-path sink: a directory per ticker, partitioned by date —
    * co-locates the dedupe/merge keys so the next run's
    * union+dropDuplicates shuffles only new dates.
    */
  def writeParquetPartitioned(): Ark = {
    val formatted = format
    val root = path.getOrElse("data/parquet")
    val target = s"$root/${ticker.name}"
    // Stage to a sibling temp dir then swap: writing mode("overwrite")
    // straight onto `target` fails with "Cannot overwrite a path that
    // is also being read from" when this Ark's plan (e.g. after a
    // previous writeParquetPartitioned) scans the same directory.
    val tmp = s"$target.tmp-${java.util.UUID.randomUUID()}"
    formatted.df.write.mode("overwrite")
      .partitionBy("date")
      .parquet(tmp)
    // Hadoop FileSystem API, not java.io/java.nio: the swap must work
    // on whatever scheme the path carries (hdfs://, s3a://, file:/) —
    // local-only File.delete/Files.move would silently no-op / throw
    // on distributed storage URIs.
    val conf = spark.sparkContext.hadoopConfiguration
    val hTarget = new org.apache.hadoop.fs.Path(target)
    val hTmp = new org.apache.hadoop.fs.Path(tmp)
    val fs = hTarget.getFileSystem(conf)
    fs.delete(hTarget, true)
    if (!fs.rename(hTmp, hTarget))
      throw new java.io.IOException(
        s"writeParquetPartitioned: rename $tmp -> $target failed")
    copy(df = spark.read.parquet(target))
  }
}

object Ark {

  /** Build from an ingest source: read existing parquet history, fetch
    * the update (mode-dependent), format both sides, merge + dedupe
    * (ref `src/util.rs:43-82`).
    */
  def apply(spark: SparkSession, source: Source, ticker: Ticker,
      path: Option[String] = None,
      fetcher: Fetcher = HttpFetcher): Ark = {
    val existing = readParquet(spark, ticker, path)
    val history = existing.getOrElse(placeholder(spark))

    val update: Option[DataFrame] = (source, existing.isDefined) match {
      case (Source.Read, false) =>
        throw new IllegalStateException(
          "Can not read from file. file is empty, does not exist, or is locked")
      case (Source.Read, true) => None
      case (Source.Ark, _)     => Some(getCsvArk(spark, ticker, fetcher))
      case (Source.ApiIncremental | Source.ArkFundsIoIncremental, true) =>
        // High-water mark: fetch rows with date > max(date) of history
        // (ref util.rs:62-66). One tiny aggregate action. Empty/all-null
        // history (max = null) falls back to the full-fetch window.
        val lastDay = Option(history.agg(max("date")).head().get(0))
          .collect { case d: java.sql.Date => d.toLocalDate }
        Some(getApi(spark, ticker, lastDay, source, fetcher))
      case _ => Some(getApi(spark, ticker, None, source, fetcher))
    }

    val df = update match {
      case None => history
      case Some(u) if existing.isDefined =>
        concatDf(Seq(Format.dfFormat(history), Format.dfFormat(u)))
      case Some(u) => Format.dfFormat(u)
    }
    Ark(df, ticker, path)
  }

  /** The reference's empty placeholder frame (`util.rs:50`). */
  def placeholder(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq("").toDF("date")
  }

  def parquetFile(ticker: Ticker, path: Option[String]): String =
    s"${path.getOrElse("data/parquet")}/${ticker.name}.parquet"

  /** Existence-probing parquet scan (ref `util.rs:110-119`). */
  def readParquet(spark: SparkSession, ticker: Ticker,
      path: Option[String]): Option[DataFrame] = {
    val p = parquetFile(ticker, path)
    if (new java.io.File(p).exists())
      scala.util.Try(spark.read.parquet(p)).toOption
    else None
  }

  /** date ASC, weight DESC (ref `util.rs:126-131`). */
  def dfSort(df: DataFrame): DataFrame =
    df.orderBy(col("date").asc, col("weight").desc)

  /** Union + whole-row dedupe (ref `util.rs:133-145`). `unionByName`
    * (both sides are canonically formatted; order-robustness is free)
    * then `dropDuplicates` — the key is ALL columns, so Polars'
    * keep-first-stable and Spark's keep-any are indistinguishable, and
    * output order is re-established by the explicit sort before write
    * (SURVEY.md §2.6 U2).
    */
  def concatDf(dfs: Seq[DataFrame]): DataFrame =
    dedupe(dfs.reduce(_.unionByName(_, allowMissingColumns = true)))

  def dedupe(df: DataFrame): DataFrame = df.dropDuplicates()

  /** URL construction per (data_source, last_day, source) — ref
    * `util.rs:499-534`.
    */
  def apiUrl(ticker: Ticker, lastDay: Option[java.time.LocalDate],
      source: Source): String = {
    val start = "2000-01-01"
    (ticker.dataSource, lastDay, source) match {
      case (DataSource.ArkEurope, Some(d), _) =>
        s"https://api.nexveridian.com/ark_holdings?ticker=${ticker.name}&start=$d"
      case (DataSource.ArkEurope, None, _) =>
        s"https://api.nexveridian.com/ark_holdings?ticker=${ticker.name}&start=$start"
      case (_, Some(d), Source.ArkFundsIoIncremental) =>
        s"https://arkfunds.io/api/v2/etf/holdings?symbol=${ticker.name}&date_from=$d"
      case (_, None, Source.ArkFundsIoIncremental) |
           (_, _, Source.ArkFundsIoFull) =>
        s"https://arkfunds.io/api/v2/etf/holdings?symbol=${ticker.name}&date_from=$start"
      case (_, Some(d), _) =>
        s"https://api.nexveridian.com/ark_holdings?ticker=${ticker.name}&start=$d"
      case (_, None, _) =>
        s"https://api.nexveridian.com/ark_holdings?ticker=${ticker.name}&start=$start"
    }
  }

  /** JSON API fetch; arkfunds.io responses carry a `holdings`
    * array-of-struct that gets exploded + unnested
    * (ref `util.rs:536-546`).
    */
  def getApi(spark: SparkSession, ticker: Ticker,
      lastDay: Option[java.time.LocalDate], source: Source,
      fetcher: Fetcher): DataFrame = {
    val df = DataReader.jsonBytesToDf(spark,
      fetcher.fetch(apiUrl(ticker, lastDay, source)))
    source match {
      case Source.ArkFundsIoIncremental | Source.ArkFundsIoFull =>
        df.select(explode(col("holdings")).as("h")).select("h.*")
      case _ => df
    }
  }

  /** Today's CSV snapshot from ark-funds.com (ref `util.rs:550-553`). */
  def getCsvArk(spark: SparkSession, ticker: Ticker,
      fetcher: Fetcher): DataFrame =
    DataReader.csvBytesToDf(spark, fetcher.fetch(ticker.url))

  /** Write a DataFrame as ONE literal parquet file at `path`
    * (reference on-disk contract). Writes to a temp dir, then moves
    * the single part file — local-FS oriented, matching the
    * reference's single-node deployment; partitioned dirs are the
    * scale path.
    */
  def writeSingleFile(df: DataFrame, path: String): Unit = {
    val target = new java.io.File(path)
    Option(target.getParentFile).foreach(_.mkdirs())
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-parquet-").toFile
    val tmpOut = new java.io.File(tmp, "out")
    df.coalesce(1).write.mode("overwrite").parquet(tmpOut.getPath)
    val part = tmpOut.listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException("no part file written"))
    java.nio.file.Files.move(part.toPath, target.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(tmp)
  }

  /** Legacy CSV migration (ref `util.rs:555-572`): glob the ticker's
    * CSV dir → per-file read → union (schema-drift-tolerant) → merge
    * with history if present.
    */
  def mergeOldCsvToParquet(spark: SparkSession, ticker: Ticker,
      path: Option[String] = None,
      csvRoot: String = "data/csv"): Ark = {
    val dir = new java.io.File(s"$csvRoot/${ticker.name}")
    val files = Option(dir.listFiles()).getOrElse(Array.empty).map(_.getPath)
    val dfs = files.toSeq.sorted.map { f =>
      DataReader.csvBytesToDf(spark,
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(f)), java.nio.charset.StandardCharsets.UTF_8))
    }
    require(dfs.nonEmpty, s"no CSVs under $dir")
    var df = dfs.reduce(_.unionByName(_, allowMissingColumns = true))
    readParquet(spark, ticker, path).foreach { old =>
      df = Format.dfFormat(concatDf(
        Seq(Format.dfFormat(old), Format.dfFormat(df))))
    }
    Ark(df, ticker, path)
  }
}
