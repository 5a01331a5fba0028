package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout primitives. Z-ordering is the write-time move that
  * makes MULTI-column range pruning work at 100 TB: sorting by the
  * bit-interleaved key clusters rows so every file's min/max spans a
  * tight rectangle in (x, y) space — a predicate on EITHER column
  * prunes most files, where a plain lexicographic sort only prunes on
  * its leading column. The z-value itself is a pure projection
  * (shifts and masks, whole-stage codegen'd); the only cost of
  * z-ordered writes is the sort you were already paying to write
  * sorted files.
  *
  * One-definition discipline: [[zValue]] (the Spark column) and
  * [[zValueSql]] (the DuckDB rendering) are generated from the same
  * bit loop, so the q89 oracle interleaves exactly the same bits.
  */
object Layout {

  /** Morton/Z interleave of the low `bits` of two non-negative ints:
    * bit i of x lands at position 2i, bit i of y at 2i+1. Bits are
    * disjoint, so the combine is a plain sum (renders identically in
    * any SQL dialect — no operator-precedence traps).
    *
    * Inputs are cast to long before shifting: bit positions reach
    * 2*bits-1 (= 61 at bits=31), and Spark's shiftleft on IntegerType
    * wraps the shift amount mod 32 — the long cast keeps the Spark and
    * DuckDB renderings (BIGINT below) agreeing across the full range.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val (xl, yl) = (x.cast("long"), y.cast("long"))
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** [[zValue]] as SQL text over column expressions `x` and `y` —
    * same loop, same bit positions, same BIGINT promotion.
    */
  def zValueSql(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val (xl, yl) = (s"CAST($x AS BIGINT)", s"CAST($y AS BIGINT)")
    (0 until bits).map { i =>
      s"((($xl >> $i) & 1) << ${2 * i}) + ((($yl >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
  }

  /** Hilbert curve index of (x, y) on the 2^bits × 2^bits grid — the
    * CONTINUOUS space-filling curve: consecutive indices are always
    * grid-adjacent (LayoutSpec proves it exhaustively), so ANY
    * contiguous index range — in particular an arbitrary row-count
    * file boundary — spans a bounded box. The Z curve shares the
    * aligned-prefix property but jumps at power-of-two seams, so a
    * file that straddles a seam spans a box up to ~5× larger (q122
    * measures 8192 vs 1536 cells on the same shifted buckets).
    *
    * Standard per-bit quadrant walk (Wikipedia xy2d, the rot(n)
    * reflection variant — coordinates stay in [0, n) at every step,
    * so the bit tests never see negatives in either engine). The
    * quadrant term (3·rx) XOR ry is emitted in its ARITHMETIC form
    * 3·rx + ry − 2·rx·ry (identical for rx, ry ∈ {0,1}) so neither
    * rendering depends on a dialect's XOR operator.
    *
    * Emitted as one PROJECTION PER BIT over carried (_px, _py, _pd)
    * columns rather than a single nested expression: each step's
    * coordinate rewrite reads both predecessors twice, so one
    * expression tree would grow 2^bits nodes (and its SQL rendering
    * 2^bits characters); the chained form is linear in `bits` and
    * stays whole-stage-codegen'd. Mirrored step-for-step by
    * [[hilbertSql]].
    */
  def hilbertFrame(df: org.apache.spark.sql.DataFrame, x: Column,
      y: Column, bits: Int,
      out: String = "hval"): org.apache.spark.sql.DataFrame = {
    require(bits >= 1 && bits <= 15, "bits must be in [1, 15]")
    val n = 1L << bits
    var cur = df.withColumn("_px", x.cast("long"))
      .withColumn("_py", y.cast("long"))
      .withColumn("_pd", lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      val rx = shiftright(col("_px"), i).bitwiseAND(lit(1L))
      val ry = shiftright(col("_py"), i).bitwiseAND(lit(1L))
      cur = cur
        .withColumn("_rx", rx)
        .withColumn("_ry", ry)
        .withColumn("_pd", col("_pd") + lit(s * s) *
          (lit(3L) * col("_rx") + col("_ry") -
            lit(2L) * col("_rx") * col("_ry")))
        .withColumn("_nx",
          when(col("_ry") === 1, col("_px"))
            .when(col("_rx") === 1, lit(n - 1) - col("_py"))
            .otherwise(col("_py")))
        .withColumn("_ny",
          when(col("_ry") === 1, col("_py"))
            .when(col("_rx") === 1, lit(n - 1) - col("_px"))
            .otherwise(col("_px")))
        .withColumn("_px", col("_nx"))
        .withColumn("_py", col("_ny"))
        .drop("_rx", "_ry", "_nx", "_ny")
    }
    cur.withColumn(out, col("_pd")).drop("_px", "_py", "_pd")
  }

  /** [[hilbertFrame]] as a DuckDB CTE chain: `h{bits-1} … h0`, one
    * CTE per bit over carried (x, y, px, py, pd) — same loop, same
    * constants, same arithmetic quadrant term. `src` must expose
    * integer `x` and `y`; consume `pd` from `h0`.
    */
  def hilbertSql(src: String, bits: Int): String = {
    require(bits >= 1 && bits <= 15, "bits must be in [1, 15]")
    val n = 1L << bits
    val init = s"""hinit AS (SELECT x, y, CAST(x AS BIGINT) AS px,
      |  CAST(y AS BIGINT) AS py, CAST(0 AS BIGINT) AS pd FROM $src)"""
      .stripMargin
    val steps = ((bits - 1) to 0 by -1).map { i =>
      val s = 1L << i
      val prev = if (i == bits - 1) "hinit" else s"h${i + 1}"
      val rx = s"((px >> $i) & 1)"
      val ry = s"((py >> $i) & 1)"
      s"""h$i AS (SELECT x, y,
        |  CASE WHEN $ry = 1 THEN px
        |       WHEN $rx = 1 THEN ${n - 1} - py ELSE py END AS px,
        |  CASE WHEN $ry = 1 THEN py
        |       WHEN $rx = 1 THEN ${n - 1} - px ELSE px END AS py,
        |  pd + ${s * s} * (3 * $rx + $ry - 2 * $rx * $ry) AS pd
        | FROM $prev)""".stripMargin
    }
    (init +: steps).mkString(",\n")
  }
}
