package graft.ark

import org.apache.spark.sql.{DataFrame, SparkSession}

/** HTTP fetch + bytes→DataFrame parsing (reference
  * `src/util/data_reader.rs`). The fetch runs on the DRIVER — holdings
  * downloads are per-ticker and tiny (≤ a few MB); parsing distributes
  * via `spark.read` over an in-memory Dataset.
  */
trait Fetcher {
  /** GET `url`, return body text; throw on non-2xx
    * (ref `data_reader.rs:19-37`).
    */
  def fetch(url: String): String
}

/** Driver-side HTTP client with the reference's browser UA + gzip. */
object HttpFetcher extends Fetcher {
  override def fetch(url: String): String = {
    val client = java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .header("User-Agent",
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 " +
          "(KHTML, like Gecko) Chrome/119.0.0.0 Safari/537.36")
      .header("Accept-Encoding", "gzip")
      .GET().build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() < 200 || resp.statusCode() >= 300)
      throw new RuntimeException(
        s"HTTP request failed with status code: ${resp.statusCode()}")
    val raw = resp.body()
    val body =
      if (resp.headers().firstValue("Content-Encoding").orElse("") == "gzip") {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(raw))
        try in.readAllBytes() finally in.close()
      } else raw
    new String(body, java.nio.charset.StandardCharsets.UTF_8)
  }
}

object DataReader {
  /** Parse-order index column attached only to duplicate-header CSVs,
    * so the Europe junk-row skip (`slice(2)`, ref
    * `data_source.rs:137`) stays deterministic under Spark's
    * order-free execution (SURVEY.md §7.4.5).
    */
  val RowIdx = "_row_idx"

  /** Minimal RFC-4180-ish header field splitter (driver-side, one line). */
  private[ark] def splitCsvLine(line: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val ch = line.charAt(i)
      if (inQ) {
        if (ch == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') {
          cur += '"'; i += 1
        } else if (ch == '"') inQ = false
        else cur += ch
      } else ch match {
        case '"' => inQ = true
        case ',' => out += cur.result(); cur.clear()
        case c   => cur += c
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }

  /** Polars-style duplicate-header repair: the Nth duplicate of a name
    * becomes `{name}_duplicated_{N-1}` (so the Europe malformed header
    * `,,` yields a `_duplicated_0` column — the marker
    * `df_format_europe_csv` keys on, ref `data_source.rs:136`).
    */
  private[ark] def dedupeHeader(names: Seq[String]): Seq[String] = {
    val used = scala.collection.mutable.Set.empty[String]
    names.map { n =>
      if (!used.contains(n)) { used += n; n }
      else {
        var k = 0
        while (used.contains(s"${n}_duplicated_$k")) k += 1
        val nn = s"${n}_duplicated_$k"
        used += nn
        nn
      }
    }
  }

  /** CSV text → DataFrame, header row + inferred schema (ref
    * `data_reader.rs:40-42`). Embedded newlines in quoted fields are
    * not supported (each line = one record), matching the per-ticker
    * holdings exports.
    */
  def csvBytesToDf(spark: SparkSession, text: String): DataFrame = {
    import spark.implicits._
    val lines = text.split("\r?\n").toSeq.filter(_.nonEmpty)
    require(lines.nonEmpty, "empty CSV")
    val rawNames = splitCsvLine(lines.head)
    val names = dedupeHeader(rawNames)
    val hasDupes = names != rawNames
    val dataLines = lines.tail
    // Duplicate-header (Europe malformed) files get a parse-order index
    // so the downstream slice(2) is order-stable.
    val (finalNames, finalLines) =
      if (hasDupes)
        (RowIdx +: names,
          dataLines.zipWithIndex.map { case (l, i) => s"$i,$l" })
      else (names, dataLines)
    val ds = spark.createDataset(finalLines)
    val parsed = spark.read
      .option("header", "false")
      .option("inferSchema", "true")
      .csv(ds)
    // Tolerate ragged rows: truncate or pad names to the parsed width.
    val width = parsed.columns.length
    val named =
      if (finalNames.length >= width) finalNames.take(width)
      else finalNames ++ (finalNames.length until width).map(i => s"_extra_$i")
    parsed.toDF(named: _*)
  }

  /** JSON text → DataFrame (ref `data_reader.rs:43-47`): a top-level
    * array of objects becomes rows; a top-level object becomes one row
    * with a column per key (arrays of objects → array-of-struct
    * columns, unnested later by the caller).
    */
  def jsonBytesToDf(spark: SparkSession, text: String): DataFrame = {
    import spark.implicits._
    spark.read.json(spark.createDataset(Seq(text)))
  }
}
