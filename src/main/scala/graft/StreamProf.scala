package graft

/** Dev-only repeat-timer for the streaming queries (chasing the
  * recorded q41 median regression; not part of the driver contract).
  */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    val qs = Seq(graft.queries.StreamQueries.q38,
      graft.queries.StreamQueries.q40, graft.queries.StreamQueries.q41)
    for (i <- 1 to 4; q <- qs) {
      val t0 = System.nanoTime()
      q.run(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[sprof] pass$i ${q.name}%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
