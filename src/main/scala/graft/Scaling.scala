package graft


/** Scaling-evidence generator (dev-run, artifact committed as
  * SCALING.md): executes the dedup/similarity tier at two scale
  * factors and records rows read and shuffle volume per query from
  * task metrics. The point is to replace "linear at scale" prose with
  * measured growth ratios: a candidate-based operator whose shuffle
  * grows ≈ linearly with the corpus is scale-safe; anything
  * super-linear is a quadratic term that 100× would expose.
  */
object Scaling {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val allNames = Seq("q24_minhash_lsh", "q26_ngram_jaccard",
      "q43_minhash_estimate", "q49_dedup_clusters", "q50_dedup_corpus",
      "q53_dedup_incremental", "q31_embedding_neardups", "q32_cosine_ivf",
      "q54_cosine_topk", "q55_decontaminate", "q56_kmeans_train",
      "q57_semdedup", "q59_vocab_topk", "q63_chunk_dedup",
      "q70_dedup_clusters_star", "q82_chunk_dedup_rewrite", "q84_pq_ann",
      "q90_ivfpq_ann", "q95_bigram_pmi", "q100_split_leakage",
      "q101_perplexity", "q109_video_decode", "q110_bloom_prefilter",
      "q111_c4_filter", "q112_image_resize", "q113_dedup_report",
      "q114_source_overlap", "q115_cdc_chunks",
      "q116_jl_projection_recall", "q117_hashed_classifier",
      "q118_containment_dedup", "q119_cluster_split",
      "q120_weighted_sample", "q121_dedup_best_of_cluster",
      "q123_ngram_novelty", "q124_mirror_report",
      "q132_curated_shards", "q133_pack_spans", "q134_hybrid_rrf",
      "q135_label_churn", "q136_hybrid_ann_batch",
      "q137_curated_pack_spans", "q138_gopher_repetition",
      "q139_decontamination", "q140_mixture_temperature",
      "q141_multimodal_pack", "q142_asof_native", "q33_asof_join",
      "q143_asof_native_forward", "q148_ann_index_serve",
      "q150_ann_index_update", "q151_hybrid_indexed_serving",
      "q152_hard_negatives", "q157_text_index_serve",
      "q158_hybrid_stores_serving", "q159_text_index_update")
    // arg filter = re-measure a subset (e.g. an anomalous line) without
    // regenerating the whole battery; partial runs print but do NOT
    // overwrite SCALING.jsonl — patch the line by hand.
    val names =
      if (args.isEmpty) allNames else allNames.filter(args.contains)
    val byName = graft.queries.Registry.all.map(q => q.name -> q).toMap
    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)
    val out = new StringBuilder
    for (sf <- Seq("sf0.01", "sf0.1"); name <- names) {
      val q = byName(name)
      // shared warm/flush/reset/time discipline (ScalingLog.measured)
      val (_, sec) = ScalingLog.measured(spark, listener) {
        q.run(spark, s"/root/testdata/$sf").write
          .format("noop").mode("overwrite").save()
        0L
      }
      val line =
        s"""{"sf":"$sf","query":"$name","input_records":${listener.inputRecords},""" +
        s""""shuffle_write_bytes":${listener.shuffleWriteBytes},""" +
        s""""shuffle_write_records":${listener.shuffleWriteRecords},""" +
        s""""shuffle_read_bytes":${listener.shuffleReadBytes},""" +
        s""""sec":${f"$sec%.3f"}}"""
      println(s"[scaling] $line")
      out.append(line).append('\n')
    }
    if (args.isEmpty)
      // this main owns the UNTIERED batch lines at the file head;
      // other generators' tiered slices survive a full regen
      ScalingLog.replaceSlice(ScalingLog.untiered, out.toString,
        prepend = true)
    spark.stop()
  }
}
