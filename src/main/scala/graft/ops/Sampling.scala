package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling, splitting, and corpus mixing —
  * the reproducible alternatives to `rand()`/`sample()` that large
  * training-data pipelines actually run: membership is a pure function
  * of the row's id, so re-runs, task retries, and incremental refreshes
  * select the SAME rows (a rand()-drawn sample is re-drawn per task
  * attempt — the same retry-instability class as SPARK-23207 salting),
  * and train/test membership survives pipeline evolution.
  *
  * All pure codegen'd column expressions: zero shuffles, filters can
  * sit directly on the scan. The bucket function is md5-based so any
  * engine (the DuckDB oracle included) reproduces membership exactly.
  */
object Sampling {

  /** Uniform bucket in [0, buckets): first 32 bits of md5 of the id's
    * decimal string. DuckDB equivalent:
    * `CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8)) AS BIGINT)
    *  % buckets`.
    */
  def hashBucket(id: Column, buckets: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Keep ~pct% of rows, deterministically. */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(idCol), 100) < pct)

  /** Assign train/val/test by hash bucket (percent sizes; the rest is
    * train). A row's split never changes across runs or data growth.
    */
  def split(df: DataFrame, idCol: String, valPct: Int,
      testPct: Int): DataFrame = {
    val b = hashBucket(col(idCol), 100)
    df.withColumn("split",
      when(b < valPct, "val")
        .when(b < valPct + testPct, "test")
        .otherwise("train"))
  }

  /** Stratified corpus mix: per-stratum keep rates in percent (the
    * source-weighting step of corpus assembly). Strata missing from
    * `rates` are dropped — the rate table IS the mix recipe.
    */
  def stratifiedMix(df: DataFrame, idCol: String, stratumCol: String,
      rates: Seq[(String, Int)]): DataFrame = {
    val b = hashBucket(col(idCol), 100)
    val keep = rates.foldLeft(lit(false)) { case (acc, (s, r)) =>
      acc || (col(stratumCol) === s && b < r)
    }
    df.filter(keep)
  }

  /** Keep the top `n` rows per group in `order` — the per-source cap
    * of corpus curation (bound a crawler-heavy source at N docs,
    * best-quality first). Appends the 1-based `rk` rank. One window
    * shuffle keyed by the group; per-task state is one group's rows.
    * With corpus-scale groups and a small `n`, the scale upgrade is a
    * per-partition pre-cap (any task needs only its local top-n)
    * before the global window — same move as q47's packing shards.
    */
  def capPerGroup(df: DataFrame, groupCols: Seq[String],
      order: Seq[Column], n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= n)
  }

  /** Fill a per-group token budget in priority order: rows are ranked
    * by `order` (quality-first curriculum) and kept while the running
    * `tokCol` total — including the current row — stays ≤ `budget`.
    * Appends `cum_tokens`. The running sum makes the group a total
    * order, so the window key is the group itself; at corpus-scale
    * groups the 100 TB shape is two-pass: histogram the order column,
    * pick the cutoff whose token mass reaches the budget, pre-filter
    * to ≈budget candidates, THEN run this exact window on the
    * survivors (semantics unchanged — the cutoff only drops rows the
    * cumsum would reject anyway).
    */
  def budgetFill(df: DataFrame, groupCols: Seq[String],
      order: Seq[Column], tokCol: Column, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(order: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("cum_tokens", sum(tokCol).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Weighted sample WITHOUT replacement of size k
    * (Efraimidis–Spirakis A-ES, exponential form): each row draws
    * e = −ln(u)/w with u ∈ (0,1] md5-derived from its id, and the k
    * SMALLEST keys are the sample — inclusion probability
    * proportional to weight, single pass, no rejection loop. u is
    * deterministic (first 32 md5 bits + 1, over 2³²), so the sample
    * is retry-stable and engine-reproducible like every sampler
    * here; ln is the one libm call and is rounded to 6 before the
    * division (its argument is ONE division of exact integers — the
    * ln discipline). The global bottom-k compiles to
    * TakeOrderedAndProject: per-partition partial top-k, no full
    * sort — the only all-reduce is k rows. Rows with weight ≤ 0 or
    * NULL are excluded (they have zero inclusion probability).
    * Emits the input row + `skey` for the k winners.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val u32 = conv(substring(md5(col(idCol).cast("string")), 1, 8),
      16, 10).cast("long")
    val lnu = round(log((u32 + 1) / 4294967296.0), 6)
    df.filter(col(weightCol) > 0)
      .withColumn("skey", round(-lnu / col(weightCol), 6))
      .orderBy(col("skey").asc, col(idCol).asc)
      .limit(k)
  }
}
