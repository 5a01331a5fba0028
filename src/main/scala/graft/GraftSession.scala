package graft

import org.apache.spark.sql.SparkSession

/** One place to build sessions with the engine's required configs.
  *
  * - `spark.sql.ansi.enabled=false`: Spark 4.x defaults ANSI on, which
  *   makes `to_date`/casts THROW on unparseable input. The reference's
  *   semantics (Polars `strptime(strict=false)`, silent-null casts —
  *   reference `src/util.rs:209-238,244-289`) require null-on-failure;
  *   the multi-format date vote depends on it (SURVEY.md §4.2).
  * - `spark.sql.session.timeZone=UTC`: deterministic date/timestamp
  *   semantics, matches the DuckDB oracle.
  * - AQE on: runtime re-plan (skew joins, coalesced shuffle reads) —
  *   the 100 TB posture even though tests run local.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      // the events table carries TIMESTAMP(NANOS) parquet columns,
      // which Spark only reads as raw nanos-since-epoch longs
      // (converted back to TIMESTAMP_NTZ in the query layer).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(cpus: Int): SparkSession = {
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Session for a `spark-submit`ted app: the same engine invariants,
    * with master coming from the submit conf (DEPLOY.md). Sizing
    * configs are FILLED, not forced: shuffle partitions default to
    * 2× the cluster's default parallelism and the broadcast
    * threshold to builder()'s 64 MiB engine invariant, but an
    * explicit `--conf` from the submitter wins for both.
    *
    * The sizing fill only happens when THIS call creates the session.
    * If the app already built one, `getOrCreate` returns it — Spark
    * applies the `.config` pairs above as runtime SQL conf but NOT
    * the extensions — and overriding conf the app set through
    * `session.conf` (invisible in the submit `SparkConf`) would
    * silently undo the app's own sizing. In that case this method
    * touches nothing and the caller owns the invariants; create the
    * session through `submitted()` first if you want the full
    * contract (Main does).
    */
  def submitted(): SparkSession = {
    val preExisting = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    val s = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    val submitConf = s.sparkContext.getConf
    if (!preExisting) {
      if (!submitConf.contains("spark.sql.shuffle.partitions"))
        s.conf.set("spark.sql.shuffle.partitions",
          math.max(s.sparkContext.defaultParallelism * 2, 32).toString)
      if (!submitConf.contains("spark.sql.autoBroadcastJoinThreshold"))
        s.conf.set("spark.sql.autoBroadcastJoinThreshold",
          (64 * 1024 * 1024).toString)
    }
    s
  }
}
