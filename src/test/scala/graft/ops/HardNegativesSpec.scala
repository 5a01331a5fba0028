package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Brute-force pin of the symmetric-PQ hard-negative miner
  * ([[Similarity.hardNegatives]] / q152): the codeword-pair
  * distances, the cell/label pairing rules and the per-vector
  * ranking are recomputed in plain Scala from the SAME persisted
  * index the operator reads — independent of the Spark plan and the
  * DuckDB oracle. (The codes/codebooks themselves are pinned by
  * AnnIndexStoreSpec and PqSpec.)
  */
class HardNegativesSpec extends SparkSpec {

  private val k = 5

  private lazy val emb = sf("embeddings")
  private lazy val idx = {
    val tmp =
      java.nio.file.Files.createTempDirectory("ann-negatives").toString
    AnnIndexStore.build(emb, "vec_id", "embedding", tmp,
      col("vec_id") % 50 === 7, col("vec_id") % 10 === 3,
      m = 2, subDim = 32, iters = 2)
  }
  private lazy val labels = emb.select(col("vec_id"), col("label"))

  private lazy val mined = Similarity.hardNegatives(idx.codes(spark),
      "vec_id", labels, "label", idx.codebooks(spark), m = 2, k = k)
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    .toSeq

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("mined negatives equal the plain-Scala recomputation") {
    // raw materials straight from the persisted index
    val cb = idx.codebooks(spark).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        r.getSeq[Double](2).toArray))
    val cwDist = (for {
      (ja, ca, ea) <- cb; (jb, cbid, ebv) <- cb if ja == jb
    } yield {
      def dot(a: Array[Double], b: Array[Double]) =
        a.zip(b).map { case (x, y) => x * y }.sum
      ((ja, ca, cbid), r6(dot(ea, ea) - 2 * dot(ea, ebv) + dot(ebv, ebv)))
    }).toMap
    val lab = labels.collect().map(r => r.getLong(0) -> r.get(1)).toMap
    val coded = idx.codes(spark).collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[Long]("_c0"),
        r.getAs[Long]("_c1"), r.getAs[Number]("cell").longValue()))
    val expected = coded.flatMap { case (id, a0, a1, cell) =>
      coded.filter { case (nid, _, _, ncell) =>
        ncell == cell && nid != id && lab(nid) != lab(id) }
        .map { case (nid, b0, b1, _) =>
          (id, nid,
            r6(cwDist((0, a0, b0)) + cwDist((1, a1, b1)))) }
        .sortBy { case (_, nid, d) => (d, nid) }
        .take(k).zipWithIndex
        .map { case ((i, n, d), r) => (i, n, d, r + 1) }
    }.toSeq
    assert(mined.sorted == expected.sorted)
  }

  test("invariants: different labels, same cell, contiguous ranks") {
    val lab = labels.collect().map(r => r.getLong(0) -> r.get(1)).toMap
    val cell = idx.codes(spark).collect().map(r =>
      r.getAs[Long]("vec_id") ->
        r.getAs[Number]("cell").longValue()).toMap
    assert(mined.nonEmpty)
    mined.foreach { case (id, nid, _, _) =>
      assert(lab(id) != lab(nid), s"$id,$nid share a label")
      assert(cell(id) == cell(nid), s"$id,$nid cross cells")
    }
    mined.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.map(_._4).sorted == (1 to rows.size),
        s"ranks not contiguous for $id")
    }
  }

  test("symmetric distance: pairs present both ways agree") {
    val d = mined.map { case (a, b, dist, _) => (a, b) -> dist }.toMap
    val both = d.keys.filter { case (a, b) => d.contains((b, a)) }
    assert(both.nonEmpty, "fixture produced no bidirectional pair")
    both.foreach { case (a, b) =>
      assert(d((a, b)) == d((b, a)), s"asymmetric dist for $a,$b")
    }
  }
}
