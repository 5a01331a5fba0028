package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The BM25 side of retrieval as a PERSISTED index — the sparse twin
  * of [[AnnIndexStore]], closing the other half of the hybrid
  * serving story: q75/q134/q146 recompute term frequencies, document
  * lengths and corpus stats from the raw text inside every plan,
  * which keeps the whole stack inside one oracle hash but re-pays
  * the corpus tokenization per query batch. A deployed service
  * tokenizes ONCE into three stages under one directory:
  *
  *  - `postings` (token, idCol, tf) — the full-vocabulary inverted
  *    rows, append-only, written sorted by token so a term query's
  *    `token IN (...)` pushes into the parquet scan and row-group
  *    stats prune the untouched vocabulary. (At cluster scale this
  *    stage is bucketed BY TOKEN through the catalog — the
  *    [[CurationStore]] labels discipline — so a term probe reads
  *    its buckets; locally the store keeps plain sorted parquet and
  *    the pushed filter, which the spec pins.)
  *  - `doclens` (idCol, dl) — append-only.
  *  - `stats` (n, sumdl) — ONE row of exact integer counters, the
  *    swap-commit stage: an update folds the batch in additively
  *    (disjoint-id contract), and because both counters are exact
  *    BIGINTs the updated stats equal a full rebuild's EXACTLY —
  *    idf and avgdl follow, so incremental maintenance is
  *    bit-identical to rebuilding (q159 pins it through the full
  *    oracle).
  *
  * [[bm25]] scores any term set from the stored stages through the
  * SAME kernel as the from-corpus path ([[TextOps.bm25ScoreFrames]]
  * — one definition, so the two cannot drift). Crash/replay
  * discipline is [[UpdateMarker.settle]]'s swap-commit protocol
  * verbatim (stats is the commit stage, postings/doclens the
  * append-only sides healed on a pre-commit crash; `batchId` makes
  * committed-but-unacknowledged replays detected no-ops). SINGLE
  * WRITER per store directory — the standing caveat applies.
  */
object TextIndexStore {

  final case class Index(dir: String, idCol: String) {
    def postings(s: SparkSession): DataFrame =
      s.read.parquet(s"$dir/postings")
    def doclens(s: SparkSession): DataFrame =
      s.read.parquet(s"$dir/doclens")
    def stats(s: SparkSession): DataFrame =
      s.read.parquet(s"$dir/stats")
  }

  private def stageMap(dir: String): Map[String, String] = Map(
    "postings" -> s"$dir/postings",
    "doclens" -> s"$dir/doclens",
    "stats" -> s"$dir/stats")

  /** Per-document term frequencies and lengths for one batch of
    * docs — the only pass that touches text, shared by [[build]]
    * and [[update]] so the two tokenize identically. */
  private def derive(docs: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    val tf = docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(idCol, "token").agg(count(lit(1)).as("tf"))
      .select(col("token"), col(idCol), col("tf"))
    val dl = docs.select(col(idCol),
      TextOps.tokenCount(col(textCol)).cast("bigint").as("dl"))
    (tf, dl)
  }

  def build(docs: DataFrame, idCol: String, textCol: String,
      dir: String): Index = {
    val s = docs.sparkSession
    val (tf, dl) = derive(docs, idCol, textCol)
    // sorted by token: term-probe row-group pruning (see scaladoc)
    tf.repartition(col("token")).sortWithinPartitions("token")
      .write.mode("overwrite").parquet(s"$dir/postings")
    dl.write.mode("overwrite").parquet(s"$dir/doclens")
    dl.agg(count(lit(1)).as("n"),
        sum("dl").as("sumdl"))
      .write.mode("overwrite").parquet(s"$dir/stats")
    UpdateMarker.clear(new Path(dir)
      .getFileSystem(s.sessionState.newHadoopConf()), dir)
    Index(dir, idCol)
  }

  /** Fold a new doc batch in: postings/doclens append THEIR rows
    * only (per-document derivations — a full rebuild would produce
    * exactly these rows for these ids), stats fold additively and
    * commit through the stage swap. Ids must be disjoint from the
    * stored corpus.
    */
  def update(idx: Index, newDocs: DataFrame, textCol: String,
      batchId: Option[String] = None): Index = {
    val s = newDocs.sparkSession
    val fs = new Path(idx.dir)
      .getFileSystem(s.sessionState.newHadoopConf())
    if (UpdateMarker.settle(s, fs, idx.dir, "stats",
        stageMap(idx.dir), batchId))
      return idx // this very batch already applied — no-op
    val (tf, dl) = derive(newDocs, idx.idCol, textCol)
    tf.repartition(col("token")).sortWithinPartitions("token")
      .write.mode("append").parquet(s"${idx.dir}/postings")
    dl.write.mode("append").parquet(s"${idx.dir}/doclens")
    s.catalog.refreshByPath(s"${idx.dir}/postings")
    s.catalog.refreshByPath(s"${idx.dir}/doclens")
    val batchStats = dl.agg(count(lit(1)).as("_bn"),
      coalesce(sum("dl"), lit(0L)).as("_bsum"))
    idx.stats(s).crossJoin(batchStats)
      .select((col("n") + col("_bn")).as("n"),
        (col("sumdl") + col("_bsum")).as("sumdl"))
      .write.mode("overwrite").parquet(s"${idx.dir}/stats.next")
    StageSwap.swapIn(s, s"${idx.dir}/stats")
    batchId.foreach(UpdateMarker.writeApplied(fs, idx.dir, _))
    UpdateMarker.delete(fs, UpdateMarker.markerPath(idx.dir))
    idx
  }

  /** Score every stored document against `terms` — (idCol, score),
    * the q75 contract, from the stored stages only: the corpus text
    * is never touched, the postings scan reads the probed terms'
    * row groups, and the scoring math is the shared kernel.
    */
  def bm25(s: SparkSession, idx: Index, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val tf = idx.postings(s).filter(col("token").isin(terms: _*))
      .select(col(idx.idCol), col("token"), col("tf"))
    val stats = idx.stats(s)
      .select(col("n").as("_n"),
        (col("sumdl") / col("n")).as("_avgdl"))
    TextOps.bm25ScoreFrames(tf, idx.doclens(s), stats, idx.idCol,
      terms, k1, b)
  }

  // ---- session-lifetime store per corpus directory ----------------

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, Index]()

  def indexDirFor(dataDir: String, suffix: String = ""): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(dataDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map(b => f"$b%02x").mkString
    "target/text-index/" +
      dataDir.replaceAll("[^A-Za-z0-9.]+", "_").stripPrefix("_") +
      s"-$digest$suffix"
  }

  /** The memoized index for the `documents` corpus at `dataDir`:
    * tokenized once per JVM, served by every consumer query. */
  def forCorpus(s: SparkSession, dataDir: String): Index =
    built.computeIfAbsent(dataDir, d =>
      build(s.read.parquet(s"$d/documents.parquet"), "doc_id", "text",
        indexDirFor(d)))
}
