package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The tier-parallel runner's contract: results come back in argument
  * position (not completion order), every task is awaited before a
  * failure propagates (no background tier write outlives the
  * coordinator call), and the FIRST failure by argument order is the
  * one rethrown. The semantic equivalence of the parallelized store
  * transactions themselves is pinned by the standing store suites
  * (CorpusStoreSpec & co. now execute through the parallel path).
  */
class TierParSpec extends AnyFunSuite {

  test("results come back in argument position") {
    val (a, b, c, d) = TierPar.par4(
      { Thread.sleep(30); "slow-first" },
      "fast-second",
      { Thread.sleep(10); 3 },
      Some(4L))
    assert(a == "slow-first" && b == "fast-second" && c == 3 &&
      d.contains(4L))
  }

  test("a failing task rethrows AFTER every other task finished") {
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val e = intercept[IllegalStateException] {
      TierPar.par3(
        { Thread.sleep(20); done.incrementAndGet() },
        throw new IllegalStateException("tier boom"),
        { Thread.sleep(40); done.incrementAndGet() })
    }
    assert(e.getMessage == "tier boom")
    // both healthy tasks ran to completion before the rethrow — a
    // crash-like failure must not leave sibling tier writes running
    // in the background while the coordinator unwinds
    assert(done.get() == 2)
  }

  test("first failure by ARGUMENT order wins when several fail") {
    val e = intercept[IllegalStateException] {
      TierPar.par2(
        { Thread.sleep(40); throw new IllegalStateException("first") },
        throw new IllegalStateException("second"))
    }
    assert(e.getMessage == "first")
  }

  test("tasks run concurrently, not sequentially") {
    val t0 = System.nanoTime()
    TierPar.par4(Thread.sleep(80), Thread.sleep(80), Thread.sleep(80),
      Thread.sleep(80))
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 240, s"4 x 80ms tasks took ${ms}ms — not overlapped")
  }
}
