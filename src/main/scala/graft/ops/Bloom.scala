package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Bloom filter — the exact-dedup PRE-FILTER at 100 TB:
  * instead of anti-joining every new batch against the full corpus
  * (a corpus-wide shuffle per batch), build the corpus's bit set once
  * (a few KB) and probe the batch map-side against the broadcast
  * bitmap. No false negatives — a `member = false` row is DEFINITELY
  * new and skips the expensive path; `member = true` rows (true hits
  * plus the ~(1−e^(−kn/m))^k false-positive tail) fall through to the
  * exact check, which now touches a sliver of the batch.
  *
  * Representation: `m` bits as `m/32` rows of (word, bits) — 32-bit
  * payloads in a BIGINT keep every value positive and every shift
  * in-range, so the Spark build and the DuckDB oracle (q110) compute
  * bit-identical bitmaps (no arithmetic-vs-logical shift or
  * shift-overflow edge in either engine). Positions come from `k`
  * disjoint 8-hex-char slices of the key's md5 (the battery's one
  * hash discipline), mod `m`.
  *
  * Plan shape: build = one explode(k) + one partial-aggregated
  * groupBy collapsing to m/32 rows; probe = explode(k) + broadcast
  * join + one groupBy(key) — the corpus never re-shuffles.
  */
object Bloom {

  /** Bit positions of a key: slice j of md5 → BIGINT → mod m. */
  def positions(key: Column, m: Int, k: Int): Seq[Column] = {
    require(k >= 1 && k <= 4, "k in [1,4]: md5 yields four 8-hex slices")
    require(m >= 32 && (m & (m - 1)) == 0, "m must be a power of two")
    (0 until k).map { j =>
      conv(substring(md5(key), 1 + 8 * j, 8), 16, 10).cast("long") % m
    }
  }

  /** Build the (word, bits) bitmap over `keys(keyCol)`. */
  def build(keys: DataFrame, keyCol: String, m: Int = 8192,
      k: Int = 3): DataFrame =
    keys.select(explode(array(
        positions(col(keyCol), m, k): _*)).as("_pos"))
      .select(shiftright(col("_pos"), 5).as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 32 AS INT))")
          .as("_bit"))
      .groupBy("word").agg(bit_or(col("_bit")).as("bits"))

  /** Union two [[build]] bitmaps — the incremental-maintenance move:
    * yesterday's corpus filter ∪ today's batch filter, without
    * re-hashing the corpus (same m and k on both sides, the caller's
    * contract). Bitwise OR distributes over the word rows, so the
    * merge is one tiny groupBy over ≤ 2·m/32 rows.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("word").agg(bit_or(col("bits")).as("bits"))

  /** Probe `probes(keyCol)` against a [[build]] bitmap: one row per
    * input row, `member = true` iff ALL k bits are set. `idCols`
    * ride along (the probe frame's identity). The probe is k chained
    * BROADCAST lookups of the (tiny) bitmap — no explode, no groupBy:
    * the probe side runs ZERO shuffles, which is the whole point of
    * the pre-filter at 100 TB (an explode + re-group would shuffle
    * the batch it exists to protect).
    */
  def probe(probes: DataFrame, idCols: Seq[String], keyCol: String,
      bloom: DataFrame, m: Int = 8192, k: Int = 3): DataFrame = {
    // working columns live in a reserved namespace so a probe frame's
    // own columns can't silently collide with them; `member` is the
    // one name the OUTPUT claims, so reject id frames that carry it.
    require(!idCols.contains("member"),
      "idCols must not include the reserved output column 'member'")
    val reserved = probes.columns.filter(_.startsWith("_graft_bloom_"))
    require(reserved.isEmpty,
      s"probe frame carries reserved columns: ${reserved.mkString(",")}")
    def p(j: Int) = s"_graft_bloom_p$j"
    def wd(j: Int) = s"_graft_bloom_w$j"
    def b(j: Int) = s"_graft_bloom_b$j"
    def h(j: Int) = s"_graft_bloom_h$j"
    val pos = positions(col(keyCol), m, k)
    val joined = (0 until k).foldLeft(
      probes.select((idCols :+ keyCol).distinct.map(col): _*)) { (df, j) =>
      df.withColumn(p(j), pos(j))
        .withColumn(wd(j), shiftright(col(p(j)), 5))
        .join(broadcast(bloom.select(col("word").as(wd(j)),
          col("bits").as(b(j)))), Seq(wd(j)), "left")
        .withColumn(h(j), col(b(j)).isNotNull && expr(
          s"(shiftright(${b(j)}, CAST(${p(j)} % 32 AS INT)) & 1) = 1"))
    }
    joined.select(idCols.map(col) :+
      (0 until k).map(j => col(h(j))).reduce(_ && _).as("member"): _*)
  }
}
