package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev-only epoch-overhead profiler for the gated stream (q190's
  * shape): times the WHOLE AvailableNow run and each foreachBatch
  * BODY separately, so the residual — trigger latency, micro-batch
  * planning, file-source listing, offset/commit WAL writes — is
  * measured instead of argued (the r17 verdict's item 6: "per-epoch
  * overhead measured and either reduced or documented as floor with
  * numbers"). Epoch ORDER is semantics (sequential admission); only
  * the stream-driver overhead between epochs is under study here.
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     tools/run_main.sh graft.StreamEpochProf [repeats]
  */
object StreamEpochProf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repeats = args.headOption.map(_.toInt).getOrElse(3)
    val s = GraftSession.local(cpus)
    import graft.ops.{AnnIndexStore, CorpusStore}
    val docs = graft.queries.Registry.table(s, dir, "documents")
    val emb = graft.queries.Registry.table(s, dir, "embeddings")
    val corpus = docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(docs("doc_id"), col("text"), col("embedding"))
    val c = AnnIndexStore.CorpusDials
    val evenDials = AnnIndexStore.Dials(col("doc_id") % 50 === 8,
      col("doc_id") % 10 === 4, c.m, c.subDim, c.iters)

    for (r <- 1 to repeats) {
      val inDir = java.nio.file.Files.createTempDirectory("sep-in")
      val ckptDir = java.nio.file.Files.createTempDirectory("sep-ckpt")
      val storeDir = java.nio.file.Files.createTempDirectory("sep-store")
      val st = CorpusStore.build(corpus.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", "embedding", s"$storeDir/quad",
        annDials = Some(evenDials))
      Seq(1, 3, 5).zipWithIndex.foreach { case (m, i) =>
        graft.ark.Ark.writeSingleFile(
          corpus.filter(col("doc_id") % 6 === m),
          s"$inDir/slice$i.parquet")
      }
      val bodySec = new java.util.concurrent.ConcurrentHashMap[Long, Double]()
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions",
        s.conf.get("spark.graft.stream.shufflePartitions", "8"))
      val t0 = System.nanoTime()
      try {
        s.readStream.schema(corpus.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(inDir.toString)
          .writeStream
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[
               org.apache.spark.sql.Row], epochId: Long) =>
              val b0 = System.nanoTime()
              CorpusStore.ingestScreened(st, batch.toDF(), "text",
                "embedding", s"epoch-$epochId")
              bodySec.put(epochId, (System.nanoTime() - b0) / 1e9)
              ()
          }
          .option("checkpointLocation", ckptDir.toString)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      val total = (System.nanoTime() - t0) / 1e9
      val bodies = bodySec.values().toArray.map(_.asInstanceOf[Double])
      val overhead = total - bodies.sum
      println(f"[sep] pass$r total=$total%.2f s, " +
        f"bodies=${bodies.sum}%.2f s (${bodies.sorted.mkString(", ")})" +
        f", stream-driver overhead=$overhead%.2f s over " +
        f"${bodies.length} epochs " +
        f"(${overhead / math.max(bodies.length, 1)}%.2f s/epoch)")
      Seq(inDir, ckptDir, storeDir).foreach { p =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(p.toFile)
      }
    }
    s.stop()
  }
}
