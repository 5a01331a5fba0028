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

  /** The rot(n) xy2d walk, plain Scala — [[Layout.hilbertFrame]]'s
    * independent twin for the exhaustive pins below.
    */
  private def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var (x, y, d) = (x0, y0, 0L)
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbertFrame matches plain-Scala xy2d over the full 64×64 grid") {
    import spark.implicits._
    val pts = for (x <- 0 until 64; y <- 0 until 64) yield (x, y)
    val got = Layout.hilbertFrame(pts.toDF("x", "y"),
        col("x"), col("y"), 6)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == xy2d(6, x, y), s"($x, $y)")
    }
  }

  test("hilbert is bijective AND continuous: consecutive d are adjacent") {
    val bits = 6
    val n = 1 << bits
    val pos = (for (x <- 0 until n; y <- 0 until n)
      yield xy2d(bits, x, y) -> (x, y)).toMap
    assert(pos.size == n * n && pos.keySet.min == 0 &&
      pos.keySet.max == n * n - 1, "bijection")
    (0 until n * n - 1).foreach { d =>
      val (x1, y1) = pos(d); val (x2, y2) = pos(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1)→($x2,$y2)")
    }
    // the Z curve is NOT continuous: its seam jump is what q122's
    // shifted buckets expose
    val zpos = (for (x <- 0 until n; y <- 0 until n)
      yield morton(x, y, bits) -> (x, y)).toMap
    val jumps = (0 until n * n - 1).count { d =>
      val (x1, y1) = zpos(d); val (x2, y2) = zpos(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(jumps > 0, "z-order should jump somewhere")
  }

  test("hilbert boxes beat z-order boxes on shifted buckets (dense grid)") {
    // q122's comparison needs DENSE coverage to measure the CURVES
    // (on the sparse sf0.001 event sample box areas measure where
    // points landed); this is the same shifted-bucket model over the
    // full 256×180 grid the query's (x, y) domain spans — the worst
    // z box straddles the curve's seam and is >5× the worst hilbert
    // box (8192 vs 1536 cells; sf0.1's dense output shows the same).
    def boxMax(curve: (Long, Long) => Long): Long = {
      val boxes = scala.collection.mutable.Map
        .empty[Long, (Long, Long, Long, Long)]
      for (x <- 0L until 256L; y <- 0L until 180L) {
        val b = (curve(x, y) + 512) >> 10
        val (a1, a2, a3, a4) =
          boxes.getOrElse(b, (Long.MaxValue, -1L, Long.MaxValue, -1L))
        boxes(b) = (a1 min x, a2 max x, a3 min y, a4 max y)
      }
      boxes.values.map { case (x1, x2, y1, y2) =>
        (x2 - x1 + 1) * (y2 - y1 + 1) }.max
    }
    val h = boxMax(xy2d(8, _, _))
    val z = boxMax(morton(_, _, 8))
    assert(h == 1536L && z == 8192L, s"hilbert $h / zorder $z")
  }
}
