package graft.ark

/** Cluster entrypoint (DEPLOY.md): the reference's scheduler daemon
  * (`Dockerfile` → `docker-compose.yml:1-20` run loop) as a Spark
  * application — session invariants from [[graft.GraftSession]],
  * schedule/source/ticker config from the environment exactly as the
  * reference reads them ([[Scheduler.Config]]).
  */
object Main {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.submitted()
    try Scheduler.run(spark) finally spark.stop()
  }
}
