package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (usually) an
  * equivalent DuckDB SQL oracle over the same parquet tables. The
  * driver hash-compares the two at sf0.01; queries without an oracle
  * get a weaker rows-only check.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events` with `ts` normalized to a timezone-free timestamp,
    * whatever the generator wrote: TIMESTAMP(NANOS) arrives as a
    * nanos-since-epoch long (GraftSession nanosAsLong; ns → µs is
    * exact for this corpus), TIMESTAMP(MICROS) arrives as a native
    * timestamp type and only needs the NTZ cast (session tz = UTC,
    * so the wall-clock values are identical either way).
    */
  def events(s: SparkSession, dir: String): DataFrame =
    EventTs.toNtz(table(s, dir, "events"))

  lazy val all: Seq[Q] =
    Relational.qs ++ TextQueries.qs ++ SimilarityQueries.qs ++
      StreamQueries.qs
}

/** The ONE place that knows how the events generator may have typed
  * `ts` — TIMESTAMP(NANOS) arriving as epoch-nanos longs (under
  * GraftSession's nanosAsLong) or a native timestamp type — and how
  * to normalize it to each shape the engine pins (batch queries:
  * timezone-free NTZ; streams: UTC TimestampType, because watermarks
  * reject NTZ; slicers and brute-force specs: epoch-nanos longs).
  * Session tz = UTC keeps all three shapes value-equal whichever way
  * the corpus was written. Every reader dispatches through here so a
  * future generator change is caught once, not in four hand-kept
  * copies.
  */
object EventTs {
  import org.apache.spark.sql.functions.{col, expr}
  import org.apache.spark.sql.types.{LongType, TimestampNTZType}

  private def isLong(df: DataFrame) =
    df.schema("ts").dataType == LongType

  /** ts → TIMESTAMP_NTZ (ns → µs is exact for these corpora). */
  def toNtz(df: DataFrame): DataFrame =
    if (isLong(df))
      df.withColumn("ts",
        expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    else if (df.schema("ts").dataType == TimestampNTZType) df
    else df.withColumn("ts", col("ts").cast("timestamp_ntz"))

  /** ts → UTC TimestampType (the watermark-capable shape). */
  def toUtcTimestamp(df: DataFrame): DataFrame =
    if (isLong(df))
      df.withColumn("ts",
        expr("cast(timestamp_micros(ts div 1000) as timestamp)"))
    else df.withColumn("ts", col("ts").cast("timestamp"))

  /** ts → epoch-nanos long (the raw shape nanos corpora arrive in). */
  def toNanosLong(df: DataFrame): DataFrame =
    if (isLong(df)) df
    else df.withColumn("ts",
      expr("unix_micros(cast(ts as timestamp)) * 1000"))
}

/** Oracle-SQL generation helpers. DuckDB dialect facts relied on:
  * `replace` is literal replace-ALL (= Spark `regexp_replace` with a
  * quoted pattern), `regexp_replace` without the 'g' flag replaces the
  * FIRST match (= our `ReplaceFirst` expression), `md5` is the same
  * lowercase hex as Spark's.
  */
object SqlGen {
  def lit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Escape regex metacharacters so a literal lands in RE2 intact. */
  def reQuote(s: String): String =
    s.flatMap(c => if ("\\.[]{}()*+?^$|".contains(c)) s"\\$c" else c.toString)

  /** DuckDB SQL mirroring [[graft.ark.Format.scrubCompany]] — the
    * exact ~50-step chain, all/first-occurrence faithful.
    */
  def duckScrubCompany(input: String): String = {
    val folded = graft.ark.Format.companyChain.foldLeft(input) {
      case (acc, ('A', p, r)) => s"replace($acc, ${lit(p)}, ${lit(r)})"
      case (acc, (_, p, r)) =>
        s"regexp_replace($acc, ${lit(reQuote(p))}, ${lit(r)})"
    }
    s"rtrim($folded)"
  }

  /** DuckDB SQL mirroring [[graft.ark.Format.scrubTicker]]. */
  def duckScrubTicker(input: String): String = {
    val stripped = graft.ark.Format.tickerSuffixes
      .foldLeft(input)((acc, p) => s"replace($acc, ${lit(p)}, '')")
    s"rtrim(regexp_replace($stripped, 'DKNN', 'DKNG'))"
  }

  /** DuckDB CTE body producing distinct (doc_id, s) word-3-gram
    * shingle rows — mirrors [[graft.ops.Dedup.shingleRows]] (k=3).
    * One definition shared by the minhash and jaccard oracles.
    * Single-line: this gets interpolated into stripMargin'd strings,
    * where an embedded line starting with `||` would lose a pipe.
    */
  val duckShingleCte: String =
    """SELECT DISTINCT doc_id, s FROM (
      |  SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
      |    i -> list_extract(t, i) || ' ' || list_extract(t, i + 1)
      |      || ' ' || list_extract(t, i + 2))) AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      |  WHERE len(t) >= 3)""".stripMargin.replaceAll("\\s*\n\\s*", " ")

  /** DuckDB sign-LSH bucket over the first `bits` dims — mirrors
    * [[graft.ops.Similarity.signBucket]]. Shared by q28/q31.
    */
  def duckSignBucket(bits: Int): String = duckSignBucketAt(1, bits)

  /** DuckDB sign-LSH bucket over dims [offset, offset+bits) — mirrors
    * [[graft.ops.Similarity.signBucketAt]] (multi-table LSH slices).
    */
  def duckSignBucketAt(offset: Int, bits: Int): String =
    (offset until offset + bits).map(i =>
      s"CASE WHEN CAST(list_extract(embedding, $i) AS DOUBLE) >= 0 THEN '1' ELSE '0' END")
      .mkString(" || ")
}
