package graft

import org.apache.spark.sql.functions._

/** Block-max top-k serving evidence generator (dev-run,
  * `tier:"text_topk"` lines in SCALING.jsonl; prose in SCALING.md).
  *
  * The claim under test is [[ops.TextIndexStore.bm25TopK]]'s 100 TB
  * story: on a query bearing a COMMON term, plain [[ops
  * .TextIndexStore.bm25]] scores every document containing any query
  * term — the stopword makes that corpus-scale — while the top-k
  * serve generates candidates from the essential terms' surviving
  * blocks only and pushes just those candidates through the scoring
  * pipeline. Measured, not argued: the documents corpus at each SF
  * gets a planted stopword appended to every document (`the ×3` — a
  * term with df = n and corpus-scale postings), a store is built,
  * and three cases run under the task-metrics listener:
  *
  *  - `bm25_full_serve` — plain scoring of every matching document
  *    followed by the ordered top-20 (what a consumer without the
  *    metadata would run),
  *  - `bm25_topk_serve` — [[ops.TextIndexStore.bm25TopK]] at the
  *    same terms/k (bit-identical rows, spec-pinned),
  *  - `candidate_scan_rows` — the postings rows read to GENERATE
  *    candidates (the essential terms' allowed blocks), vs
  *  - `full_probe_rows` — the probed postings rows plain scoring
  *    feeds its pipeline (stopword included).
  *
  * The evidence is the candidate/full row collapse (the block-skip
  * is the scan shrink) and the shuffle-record collapse between the
  * two serves (the pipeline-volume shrink). The exact-completion
  * scan keeps ONE token-pushdown pass over the probed row groups in
  * both arms — columnar scans have no per-document skip pointers
  * (see bm25TopK's scaladoc) — so input_records stay comparable
  * while everything downstream of the scan shrinks with k, not with
  * the stopword's document frequency.
  */
object TopKScaling {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)
    val out = new StringBuilder

    def measure(sf: String, name: String, extra: Map[String, Any])(
        run: => Long): Unit = {
      val (result, sec) = ScalingLog.measured(spark, listener)(run)
      val line = ScalingLog.caseLine("text_topk", sf, name, result,
        ScalingLog.countersOf(listener), sec, extra)
      println(s"[topk] $line")
      out.append(line).append('\n')
    }

    // the verdict's serve shape: one COMMON term (the planted
    // stopword, df = n after the append) + one discriminative term
    // ("dup" — the corpus's one rare token, df ≈ 5%) — plain bm25
    // must score every document (all carry "the"); the top-k
    // serve's θ comes from the rare term, the stopword goes
    // non-essential, and candidacy collapses to the rare term's rows
    val terms = Seq("the", "dup")
    val k = 20
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val docs = spark.read
        .parquet(s"/root/testdata/$sf/documents.parquet")
        .select(col("doc_id"),
          concat(col("text"), lit(" the the the")).as("text"))
      val nDocs = docs.count()
      val dir = s"target/topkscaling/$sf/store"
      val st = ops.TextIndexStore.build(docs, "doc_id", "text", dir)

      measure(sf, "bm25_full_serve", Map("docs" -> nDocs, "k" -> k)) {
        ops.TextIndexStore.bm25(spark, st, terms)
          .orderBy(col("score").desc, col("doc_id").asc).limit(k)
          .count()
      }
      measure(sf, "bm25_topk_serve", Map("docs" -> nDocs, "k" -> k)) {
        ops.TextIndexStore.bm25TopK(spark, st, terms, k).count()
      }
      // the scan-shrink pair: candidate-generation rows vs the full
      // probe's pipeline rows (both counted through the same scans
      // the serves use)
      val snap = st.pin(spark)
      val statsF = snap.stats(spark).select(col("n").as("_n"),
        (col("sumdl") / col("n")).as("_avgdl"))
      val metaRows = spark.read.parquet(snap.metaPath)
        .filter(col("token").isin(terms: _*)).collect()
      val idfF = ops.TextOps.bm25Idf(
        snap.postings(spark).filter(col("token").isin(terms: _*))
          .select(col("doc_id"), col("token"), col("tf")), statsF)
      val d = ops.TextIndexStore.decisionOf(spark, snap, idfF,
        metaRows, terms, k, 1.2, 0.75, statsF.head().getDouble(1))
        .getOrElse(sys.error("no pruning decision at this corpus"))
      measure(sf, "candidate_scan_rows",
          Map("essential" -> d.essential.size,
            "allowed_files" -> d.allowedFiles.size,
            "probed_files" -> d.probedFiles)) {
        if (d.allowedFiles.isEmpty) 0L
        else spark.read.parquet(d.allowedFiles: _*)
          .filter(col("token").isin(d.essential: _*)).count()
      }
      measure(sf, "full_probe_rows", Map("terms" -> terms.size)) {
        snap.postings(spark).filter(col("token").isin(terms: _*))
          .count()
      }
      // the FILTERED pair (q179's shape): the same serve under a
      // one-third allow-list — the mask multiplies into the pruning
      // (θ from allowed docs only), so the pipeline-volume collapse
      // must survive the filter, not just coexist with it
      val allowed = docs.filter(col("doc_id") % 3 === 0)
        .select("doc_id")
      measure(sf, "bm25_filtered_full_serve",
          Map("docs" -> nDocs, "k" -> k)) {
        ops.TextIndexStore.bm25Filtered(spark, st, terms, allowed)
          .orderBy(col("score").desc, col("doc_id").asc).limit(k)
          .count()
      }
      measure(sf, "bm25_topk_filtered_serve",
          Map("docs" -> nDocs, "k" -> k)) {
        ops.TextIndexStore.bm25TopKFiltered(spark, st, terms, allowed,
          k).count()
      }
      // what the serve-level shuffle counters blur (both filtered
      // arms move O(|allowed|) ids through exchanges): the rows that
      // actually ENTER the scoring pipeline — the doclens join,
      // pivot and aggregation that dominate at corpus scale. The
      // filtered-full arm scores every allowed doc bearing any term
      // (the stopword makes that |allowed|-scale); the filtered
      // top-k arm scores candidates only
      def mask(df: org.apache.spark.sql.DataFrame) =
        df.join(allowed, Seq("doc_id"), "left_semi")
      val fullTf = snap.postings(spark)
        .filter(col("token").isin(terms: _*))
        .select(col("doc_id"), col("token"), col("tf"))
      measure(sf, "filtered_full_scored_rows",
          Map("docs" -> nDocs)) {
        mask(fullTf).count()
      }
      // None is a legitimate small-SF outcome: fewer than k ALLOWED
      // docs match the top-impact term, so no threshold exists and
      // the serve correctly falls back to full filtered scoring —
      // recorded as essential = 0 with the fallback's scored rows
      // (the pruning story begins where the allowed corpus outgrows
      // k, which sf0.1 shows)
      ops.TextIndexStore.decisionOf(spark, snap, idfF,
          metaRows, terms, k, 1.2, 0.75, statsF.head().getDouble(1),
          mask) match {
        case Some(df2) =>
          measure(sf, "filtered_topk_scored_rows",
              Map("essential" -> df2.essential.size,
                "allowed_files" -> df2.allowedFiles.size)) {
            val cand1 = snap.postings(spark)
              .filter(col("token") === df2.essential.head)
              .select(col("doc_id"))
            val candE =
              if (df2.allowedFiles.isEmpty) cand1
              else spark.read.parquet(df2.allowedFiles: _*)
                .filter(col("token").isin(df2.essential: _*))
                .select(col("doc_id")).unionByName(cand1)
            fullTf.join(mask(candE).distinct(), Seq("doc_id"),
              "left_semi").count()
          }
        case None =>
          measure(sf, "filtered_topk_scored_rows",
              Map("essential" -> 0, "allowed_files" -> 0)) {
            mask(fullTf).count()
          }
      }
    }

    ScalingLog.replaceSlice(ScalingLog.tier("text_topk"), out.toString)
    println("[topk] SCALING.jsonl text_topk tier replaced")
    spark.stop()
  }
}
