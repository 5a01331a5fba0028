package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Brute-force pin of the Johnson–Lindenstrauss tier (q116): the md5
  * sign matrix and the index-order projection fold are recomputed in
  * plain Scala (java MessageDigest), independent of both the Spark
  * plan and the DuckDB oracle. Plus the plan fact the scaladoc
  * claims (zero exchanges) and the shortlist-funnel saturation law.
  */
class JlSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val (outDim, inDim) = (32, 64)

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** +1 iff the first 32 md5 bits of "j,p" are even — the same
    * derivation [[Similarity.jlSignMatrix]] runs through Spark's
    * md5/conv and the oracle runs through DuckDB's md5/CAST.
    */
  private def mdSign(j: Int, p: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j,$p".getBytes("UTF-8"))
    if ((h(3) & 1) == 0) 1.0 else -1.0
  }

  test("jlProject matches a plain-Scala md5 reimplementation exactly") {
    val emb = sf("embeddings", dir)
    val got = Similarity.jlProject(emb, "vec_id", "embedding",
        outDim, inDim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val raw = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    assert(raw.nonEmpty)
    raw.foreach { case (id, e) =>
      val want = (0 until outDim).map { j =>
        var s = 0.0; var p = 0
        while (p < inDim) { s += e(p) * mdSign(j, p); p += 1 }
        r6(s)
      }
      assert(got(id) == want, s"projection mismatch for vec $id")
    }
  }

  test("sign matrix is ±1-balanced, not degenerate") {
    val rows = Similarity.jlSignMatrix(spark, outDim, inDim)
      .collect().map(_.getSeq[Double](1))
    assert(rows.length == outDim)
    rows.foreach { s =>
      assert(s.forall(v => v == 1.0 || v == -1.0))
      val plus = s.count(_ == 1.0)
      // md5 bits: binomial(64, 1/2) — 6 sigma ≈ 24
      assert(plus >= 8 && plus <= 56, s"degenerate sign row: $plus/+64")
    }
    assert(rows.distinct.length == outDim, "duplicate sign rows")
  }

  test("projection plans zero exchanges (row-parallel at any scale)") {
    val plan = Similarity.jlProject(sf("embeddings", dir), "vec_id",
        "embedding", outDim, inDim)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("shortlist funnel saturates: k ≥ corpus ⇒ recall 1.0") {
    val emb = sf("embeddings", dir)
    val n = emb.count().toInt
    val rec = Similarity.recallAgainstExact(emb, "vec_id", "embedding",
      col("vec_id") % 10 === 0, k = 5,
      Similarity.jlTopK(emb, "vec_id", "embedding",
        col("vec_id") % 10 === 0, k = n, outDim, inDim))
    val rows = rec.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) == 1.0,
      s"query ${r.get(0)}: shortlist covering the corpus must recall " +
        s"everything, got ${r.getDouble(2)}"))
  }
}
