package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order pins: the interleave is bit-exact against a plain-Scala
  * Morton encode, and the q89 profile exhibits the property z-order
  * exists to provide — every top-bits bucket spans a bounded
  * rectangle in BOTH dimensions (lexicographic sort only bounds the
  * leading one).
  */
class LayoutSpec extends SparkSpec {

  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1) << (2 * i)) + (((y >> i) & 1) << (2 * i + 1))
    }.sum

  test("zValue matches a plain-Scala Morton encode over the full grid") {
    import spark.implicits._
    // output is LONG (inputs promote so bit positions past 31 fit)
    val pts = for (x <- 0 until 64; y <- 0 until 64) yield (x, y)
    val got = pts.toDF("x", "y")
      .withColumn("z", Layout.zValue(col("x"), col("y"), 8))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z == morton(x, y, 8)) }
    // and the SQL rendering agrees with itself (same generator)
    val sql = Layout.zValueSql("x", "y", 8)
    val viaSql = pts.toDF("x", "y").selectExpr("x", "y", s"($sql) AS z")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    viaSql.foreach { case (x, y, z) => assert(z == morton(x, y, 8)) }
  }

  test("zValue agrees with the Scala encode at bits = 31 (long range)") {
    import spark.implicits._
    // bit positions reach 61: the pre-fix int math wrapped here
    val pts = Seq((0x7fffffff, 0x7fffffff), (0x40000001, 0x20000003),
      (123456789, 987654321)).toDF("x", "y")
      .withColumn("z", Layout.zValue(col("x"), col("y"), 31))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    pts.foreach { case (x, y, z) =>
      assert(z == morton(x.toLong, y.toLong, 31), s"($x, $y)")
    }
  }

  test("z is a bijection on the grid (no two points share a z)") {
    val zs = for (x <- 0 until 32; y <- 0 until 32) yield morton(x, y, 8)
    assert(zs.distinct.size == zs.size)
  }

  test("q89 buckets span bounded rectangles in BOTH dimensions") {
    val rows = graft.queries.Relational.q89
      .run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (minX, maxX) = (r.getInt(2), r.getInt(3))
      val (minY, maxY) = (r.getInt(4), r.getInt(5))
      // zbucket = z >> 10 fixes bits 5..7 of x AND y: each bucket's
      // box is at most 2^5 wide in both dimensions
      assert(maxX - minX <= 31, s"x span ${maxX - minX} in $r")
      assert(maxY - minY <= 31, s"y span ${maxY - minY} in $r")
    }
  }
}
