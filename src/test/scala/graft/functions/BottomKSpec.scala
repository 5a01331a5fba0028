package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Algebraic pins for the BottomK aggregator: commutative-monoid
  * laws over arbitrary interleavings — what makes map-side partials
  * safe at any parallelism.
  */
class BottomKSpec extends AnyFunSuite {

  private val agg = new BottomK(3)
  private val xs = Seq(("c", 3L), ("a", 1L), ("e", 5L), ("b", 2L),
    ("d", 4L), ("a", 0L))

  test("reduce-all equals the sorted take") {
    val r = xs.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(r) == xs.sorted.take(3).toList)
  }

  test("any split + merge equals the global answer") {
    val truth = xs.sorted.take(3).toList
    for (i <- 0 to xs.length) {
      val (l, rp) = xs.splitAt(i)
      val m = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        rp.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(m) == truth, s"split at $i")
    }
  }

  test("merge with zero is identity; buffers never exceed k") {
    val b = xs.foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(b, agg.zero) == b)
    assert(agg.merge(agg.zero, b) == b)
    assert(b.length <= 3)
  }
}
