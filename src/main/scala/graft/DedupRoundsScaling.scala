package graft

import org.apache.spark.sql.functions._

/** Dev-only evidence generator for the deferred pointer-jumping
  * decision on [[graft.ops.Dedup.clusters]] (r17 verdict item 8):
  * min-label propagation runs ≈ DIAMETER rounds, each round paying
  * one join + one convergence count — fine when near-dup graphs are
  * quasi-cliques (diameter 2–3), quadratic-in-rounds waste if real
  * corpora ever produced long chains. This driver MEASURES the
  * rounds:
  *
  *  - on the REAL near-dup graphs of two SFs (the battery dials
  *    16/4/0.5 over `documents`) — the production-shaped evidence;
  *  - on synthetic PATH graphs of growing diameter — the adversarial
  *    shape, showing where [[graft.ops.Dedup.clustersStar]] (rounds
  *    ≈ log d) would take over.
  *
  * Prints one JSON row per case for SCALING.jsonl (`dedup_rounds`
  * tier).
  *
  *   SPARK_GRAFT_CPUS=32 tools/run_main.sh graft.DedupRoundsScaling
  */
object DedupRoundsScaling {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import graft.ops.Dedup

    def row(tier: String, tag: String, pairs: org.apache.spark.sql.DataFrame): Unit = {
      val nPairs = pairs.count()
      val t0 = System.nanoTime()
      val labels = Dedup.clusters(pairs, "a", "b")
      val nNodes = labels.count()
      val nClusters = labels.select("cluster").distinct().count()
      val sec = (System.nanoTime() - t0) / 1e9
      labels.unpersist()
      println(s"""{"tier":"$tier","case":"$tag","pairs":$nPairs,""" +
        s""""nodes":$nNodes,"clusters":$nClusters,""" +
        s""""rounds":${Dedup.lastClustersRounds},""" +
        s""""sec":${math.rint(sec * 100) / 100}}""")
    }

    // real near-dup graphs, two SFs (battery dials)
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val docs = s.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val pairs = Dedup.minhashEstimatePairs(docs, "doc_id", "text",
        16, 4).filter(col("est_jaccard") >= 0.5)
        .select(col("a"), col("b"))
      row("dedup_rounds", s"real-$sf", pairs)
    }

    // synthetic path graphs: diameter = chain length, the worst case
    // for propagation; clustersStar's round count stays ~log d
    for (d <- Seq(4L, 16L, 64L, 256L)) {
      val chain = s.range(0, d).select(col("id").as("a"),
        (col("id") + 1L).as("b"))
      row("dedup_rounds", s"path-d$d", chain)
      val t0 = System.nanoTime()
      val star = Dedup.clustersStar(chain, "a", "b")
      star.count(); star.unpersist()
      println(s"""{"tier":"dedup_rounds","case":"path-d$d-star",""" +
        s""""sec":${math.rint((System.nanoTime() - t0) / 1e7) / 100}}""")
    }
    s.stop()
  }
}
