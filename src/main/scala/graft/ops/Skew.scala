package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation. AQE's skew-join split handles most hot keys at
  * runtime (enabled in GraftSession); explicit salting is the fallback
  * for the pathological case — a single key too large for any one
  * task — or for engines/paths where AQE can't rewrite (e.g. a
  * skewed aggregation's map side).
  */
object Skew {

  /** Salted equi-join: the big side scatters each row into one of
    * `salt` sub-keys; the small side replicates `salt`×. Result is
    * identical to `big.join(small, key)` — the salt only changes the
    * partitioning of the shuffle, splitting a hot key across `salt`
    * tasks. Cost: small side shuffles `salt`× its size (keep it the
    * dimension side).
    */
  /** Deterministic row scatter: a hash of the whole row. Task retries
    * recompute the SAME salt (monotonically_increasing_id would not —
    * the SPARK-23207 shuffle-retry row-loss class); identical
    * duplicate rows share a salt, so fully-duplicated hot rows don't
    * split — acceptable, they aggregate first anyway.
    */
  private def rowSalt(df: DataFrame, salt: Int) =
    pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(salt.toLong))

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "column name _salt is reserved by saltedJoin")
    val bigS = big.withColumn("_salt", rowSalt(big, salt))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * aggregate on (key, salt), then final aggregate on key. For
    * algebraic aggregates (sum/count/min/max) this is exactly what
    * Spark's partial aggregation already does — provided here as the
    * explicit pattern for when the grouping column must be pre-salted
    * (e.g. a non-algebraic aggregate downstream).
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      salt: Int): DataFrame = {
    require(!df.columns.contains("_salt"),
      "column name _salt is reserved by saltedSum")
    df.withColumn("_salt", rowSalt(df, salt))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_partial"))
      .groupBy(col(key))
      .agg(sum("_partial").as(s"sum_$valueCol"))
  }
}
