package graft

/** Dev-only A/B harness for the deferred 100 TB config posture
  * (guide §6 / r17 verdict item 7): parquet codec (snappy→zstd),
  * shuffle/io codec (lz4→zstd) and `maxPartitionBytes`, measured both
  * ways on an I/O-heavy battery subset — the guide demands the
  * measurement, the round rules forbid silently shipping a
  * local[32]-only config win. One JVM per variant (the io codec is
  * session-static):
  *
  *   SPARK_GRAFT_CONF_VARIANT=base|zstd|zstd1g \
  *     SPARK_GRAFT_CPUS=32 tools/run_main.sh graft.ConfPostureDev
  */
object ConfPostureDev {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val variant = sys.env.getOrElse("SPARK_GRAFT_CONF_VARIANT", "base")
    val b = GraftSession.builder(s"local[$cpus]", cpus)
      .appName(s"conf-posture-$variant")
    val spark = (variant match {
      case "base" => b
      case "zstd" => b
        .config("spark.io.compression.codec", "zstd")
        .config("spark.sql.parquet.compression.codec", "zstd")
      case "zstd1g" => b
        .config("spark.io.compression.codec", "zstd")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.files.maxPartitionBytes", "1g")
      case v => sys.error(s"unknown variant $v")
    }).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // subset: scan-heavy (q01/q17), shuffle-heavy (q74/q59/q95),
    // store-write-heavy (q149/q159), screen (q186) — the shapes the
    // posture knobs touch
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q17_events_hourly",
        "q74_tfidf_topk", "q59_vocab_topk", "q95_bigram_pmi",
        "q149_ann_index_build", "q159_text_index_update",
        "q186_dedup_screen")
    val byName = graft.queries.Registry.all.map(q => q.name -> q).toMap
    // warmup at the smallest SF (JIT), then repeat-3, min per query
    names.foreach(n =>
      BenchUtil.timeNoop(spark, byName(n), "/root/testdata/sf0.001"))
    val out = names.map { n =>
      val ts = (1 to 3).map(_ =>
        BenchUtil.timeNoop(spark, byName(n), dir))
      n -> BenchUtil.r4(ts.min)
    }
    println(s"""{"variant":"$variant","cpus":$cpus,"sf":"$dir",""" +
      out.map { case (n, t) => s""""$n":$t""" }.mkString("", ",", "}"))
    spark.stop()
  }
}
