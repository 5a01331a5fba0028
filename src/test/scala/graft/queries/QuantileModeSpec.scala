package graft.queries

import graft.SparkSpec

/** Pins the `spark.graft.quantiles.approx` mode of q48 within
  * tolerance of the exact (oracled) path — the exact form IS the
  * oracle for the 100 TB `approx_percentile` swap.
  */
class QuantileModeSpec extends SparkSpec {

  test("approx quantile mode tracks the exact quantiles within tolerance") {
    val dir = "/root/testdata/sf0.001"
    def run(): Map[String, (Double, Double, Double, Long)] =
      TextQueries.lengthQuantiles(spark, dir).collect()
        .map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
        .toMap
    val exact = run()
    assert(exact.nonEmpty)
    spark.conf.set("spark.graft.quantiles.approx", "true")
    val approx =
      try run()
      finally spark.conf.unset("spark.graft.quantiles.approx")

    assert(approx.keySet == exact.keySet)
    for ((src, (e50, e90, e99, emax)) <- exact) {
      val (a50, a90, a99, amax) = approx(src)
      assert(amax == emax, s"$src: max must be exact in both modes")
      for (((e, a), p) <- Seq((e50, a50), (e90, a90), (e99, a99))
          .zip(Seq("p50", "p90", "p99"))) {
        // GK summaries at accuracy=10000 bound rank error by n/10000 —
        // essentially exact at these group sizes, except approx returns
        // an actual element where exact interpolates between two.
        // Tolerance: one element's worth (2 tokens) or 5% relative.
        assert(math.abs(a - e) <= math.max(2.0, 0.05 * e),
          s"$src $p: approx $a vs exact $e")
      }
    }
  }

  test("approx winsorize mode tracks the exact clip bounds within tolerance") {
    val dir = "/root/testdata/sf0.001"
    def run(): Map[String, (Double, Double, Long)] =
      Relational.q71.run(spark, dir).collect()
        .map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2), r.getLong(3)))
        .toMap
    val exact = run()
    assert(exact.nonEmpty)
    spark.conf.set("spark.graft.winsorize.approx", "true")
    val approx =
      try run()
      finally spark.conf.unset("spark.graft.winsorize.approx")
    assert(approx.keySet == exact.keySet)
    for ((flag, (elo, ehi, en)) <- exact) {
      val (alo, ahi, an) = approx(flag)
      // sketch bounds land on real elements near the exact rank;
      // prices span ~[900, 105k] → 2% relative tolerance, and the
      // clipped-row count moves by at most the rank slack
      assert(math.abs(alo - elo) <= 0.02 * elo, s"$flag lo: $alo vs $elo")
      assert(math.abs(ahi - ehi) <= 0.02 * ehi, s"$flag hi: $ahi vs $ehi")
      assert(math.abs(an - en) <= math.max(4L, (0.02 * en).toLong),
        s"$flag n_clipped: $an vs $en")
    }
  }
}
