package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial-skew evidence generator (dev-run, `tier:"skew"` lines
  * appended to SCALING.jsonl; prose in SCALING.md). The uniform
  * generated corpus never ENGAGES the dedup tier's scale guards —
  * this main builds a hostile one and measures each guard's delta
  * with the guard off vs on:
  *
  * - 800 TEMPLATE docs: a 30-word boilerplate body plus a 2-word
  *   unique tail — the real-corpus pathology (empty/templated pages)
  *   that makes n-gram doc frequency and LSH band buckets explode
  *   quadratically.
  * - 100 MIRROR clusters × 3 sources with a 1-word edit — the TRUE
  *   near-dups that must SURVIVE the guards (recall is measured, not
  *   assumed).
  * - 3 900 power-law docs: length ∝ rank^-0.85 (20..2 500 words),
  *   words Zipf-drawn from a 20 000-token vocab — hot tokens, hot
  *   shingles, skewed per-doc work.
  *
  * Corpus is deterministic (seeded per doc id), written once to
  * `target/skewdata/documents.parquet`, sf0.1-sized (5 000 docs).
  */
object SkewScaling {

  private val Boiler = (0 until 30).map(i => s"tpl$i").mkString(" ")

  /** Deterministic skew corpus; one row per doc (doc_id, source,
    * text). Seeded per doc — regeneration is byte-stable.
    */
  def corpusRows(): Seq[(Long, String, String)] = {
    def zipfWord(rnd: scala.util.Random): String =
      "w" + math.max(1, math.pow(20000.0, rnd.nextDouble()).toInt)
    val template = (0L until 800L).map { i =>
      (i, s"s${i % 5}", s"$Boiler u${i}a u${i}b")
    }
    val mirrors = (0 until 100).flatMap { c =>
      val rnd = new scala.util.Random(7000 + c)
      val base = Seq.fill(60)(zipfWord(rnd)).mkString(" ")
      (0 until 3).map(m => (800L + 3 * c + m, s"mirror$m", s"$base m$m"))
    }
    val normal = (0L until 3900L).map { i =>
      val rnd = new scala.util.Random(100000 + i)
      val rank = (i % 390) + 1
      val len = math.min(2500.0, 20 + 2500.0 / math.pow(rank, 0.85)).toInt
      (1100L + i, s"s${i % 20}", Seq.fill(len)(zipfWord(rnd)).mkString(" "))
    }
    template ++ mirrors ++ normal
  }

  /** The 300 planted mirror pairs (both orders normalized a < b). */
  def mirrorPairs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 100).flatMap { c =>
      val ids = (0 until 3).map(m => 800L + 3 * c + m)
      for (i <- ids; j <- ids if i < j) yield (i, j)
    }.toDF("a", "b")
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    val dir = "target/skewdata/documents.parquet"
    corpusRows().toDF("doc_id", "source", "text")
      .repartition(32).write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    println(s"[skew] corpus written: ${docs.count()} docs")

    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)
    val out = new StringBuilder
    def measure(name: String, extra: Map[String, Any] = Map.empty)(
        run: => Long): Unit = {
      val (result, sec) = ScalingLog.measured(spark, listener)(run)
      val extras = extra.map { case (k, v) => s""","$k":$v""" }.mkString
      val line = s"""{"tier":"skew","case":"$name","result":$result,""" +
        s""""shuffle_write_records":${listener.shuffleWriteRecords},""" +
        s""""shuffle_read_records":${listener.shuffleReadRecords},""" +
        s""""max_task_shuffle_read_records":${listener.maxTaskShuffleReadRecords},""" +
        s""""sec":${f"$sec%.3f"}$extras}"""
      println(s"[skew] $line")
      out.append(line).append('\n')
    }

    // ---- LSH band join: maxBucketSize off vs on ---------------------
    def lshPairs(cap: Long) =
      graft.ops.Dedup.minhashEstimatePairs(docs, "doc_id", "text",
        numHashes = 16, numBands = 4, maxBucketSize = cap)
    measure("lsh_candidates_unguarded")(lshPairs(Long.MaxValue).count())
    measure("lsh_candidates_bucketcap100")(lshPairs(100L).count())
    // the guard must keep the TRUE near-dups: recall of the 300
    // planted mirror pairs through the capped join at the 0.5 cut
    measure("lsh_mirror_recall_pct_bucketcap100")(
      lshPairs(100L).filter(col("est_jaccard") >= 0.5)
        .join(mirrorPairs(spark), Seq("a", "b"), "left_semi")
        .count() * 100L / 300L)

    // ---- n-gram Jaccard: maxDocFreq off vs on (battery dial 64) ----
    def jac(maxDf: Long) =
      graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        threshold = 0.5, maxDocFreq = maxDf)
    measure("jaccard_pairs_unguarded")(jac(Long.MaxValue).count())
    measure("jaccard_pairs_maxdf64")(jac(64L).count())
    measure("jaccard_mirror_recall_pct_maxdf64")(
      jac(64L).select(col("d1").as("a"), col("d2").as("b"))
        .join(mirrorPairs(spark), Seq("a", "b"), "left_semi")
        .count() * 100L / 300L)

    // ---- hot-key shuffle join: plain vs salted ----------------------
    // one row per TOKEN OCCURRENCE (Zipf-hot: the rank-1 word
    // dominates), joined to the vocab on the word; merge-join hints on
    // BOTH paths so the comparison isolates the salt (broadcast would
    // hide the skew locally — at 100 TB neither side broadcasts).
    // (doc_id, pos) ride along so rows are DISTINCT — rowSalt hashes
    // the whole row, and fully-duplicate rows deliberately share a
    // salt (they'd aggregate first in a real plan).
    // the pathological key: the 9 hottest Zipf words collapse onto
    // ONE key (~24% of all rows) — the single-key-too-big-for-a-task
    // case salting exists for
    val tokens = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .withColumn("key",
        when(col("word").isin((1 to 9).map("w" + _): _*), lit("hot"))
          .otherwise(col("word")))
    val vocab = tokens.groupBy("key").agg(count(lit(1)).as("df"))
    // AQE OFF for this comparison: adaptive execution both splits
    // skewed join partitions and COALESCES small ones by size, so
    // max-task records under AQE measures the coalescer, not the
    // key distribution. Salting is documented as the fallback for
    // exactly the paths AQE can't rewrite (map-side of a skewed agg,
    // engines without runtime re-plan) — measure it there.
    def merge(df: DataFrame) = df.hint("merge")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      measure("hotkey_join_plain_noaqe")(
        merge(tokens).join(merge(vocab), "key").count())
      measure("hotkey_join_salted16_noaqe")(
        graft.ops.Skew.saltedJoin(merge(tokens), merge(vocab), "key", 16)
          .count())
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")

    // the batch Scaling main owns the file's untiered head; this
    // main owns the skew lines
    ScalingLog.replaceSlice(ScalingLog.tier("skew"), out.toString)
    spark.stop()
  }
}
