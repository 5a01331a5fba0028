package graft

/** Dev-only repeat-timer for the streaming queries (used to chase
  * recorded streaming medians; not part of the driver contract).
  * args: query names to profile (default: all streaming queries);
  * `SPARK_GRAFT_STREAM_PARTS` overrides the session's shuffle
  * partitions before the runs, to measure state-store-count cost.
  */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    sys.env.get("SPARK_GRAFT_STREAM_PARTS").foreach { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p)
    }
    val all = graft.queries.StreamQueries.qs
    val qs = if (args.isEmpty) all else all.filter(q => args.contains(q.name))
    for (i <- 1 to 3; q <- qs) {
      val t0 = System.nanoTime()
      q.run(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[sprof] pass$i ${q.name}%-26s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
