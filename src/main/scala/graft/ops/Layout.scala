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
}
