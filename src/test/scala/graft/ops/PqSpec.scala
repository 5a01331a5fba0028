package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Brute-force pin of the full product-quantization stack
  * ([[Similarity.pqTopK]] / q84): per-subspace Lloyd training,
  * encoding, asymmetric-distance tables and the final ranking are
  * recomputed in plain Scala over sf0.001 with the same rounding
  * discipline, independent of both the Spark plan and the DuckDB
  * oracle. Plus the recall sanity every ANN variant carries.
  */
class PqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val (m, subDim, iters, k) = (2, 32, 2, 10)

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def vecs: Seq[(Long, Array[Double])] =
    sf("embeddings", dir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toSeq

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Lloyd with the library's exact semantics: argmin of
    * |c|² − 2·a·c with (score, cid) tiebreak, means rounded to 6.
    */
  private def lloyd(pts: Seq[(Long, Array[Double])],
      seeds: Seq[(Long, Array[Double])]): Seq[(Long, Array[Double])] = {
    var cents = seeds
    for (_ <- 1 to iters) {
      val asg = pts.map { case (id, e) =>
        val best = cents.map { case (cid, c) =>
          (dot(c, c) - 2 * dot(e, c), cid, c) }.minBy(t => (t._1, t._2))
        (best._2, e)
      }
      cents = asg.groupBy(_._1).toSeq.map { case (cid, g) =>
        cid -> Array.tabulate(subDim)(p =>
          r6(g.map(_._2(p)).sum / g.size))
      }
    }
    cents
  }

  test("q84 PQ matches a plain-Scala reimplementation end to end") {
    val all = vecs
    val expected = (0 until m).map { j =>
      val sliced = all.map { case (id, e) =>
        id -> e.slice(j * subDim, (j + 1) * subDim) }
      val cents = lloyd(sliced, sliced.filter(_._1 % 10 == 3))
      val codes = sliced.map { case (id, e) =>
        id -> cents.map { case (cid, c) =>
          (dot(c, c) - 2 * dot(e, c), cid) }.min._2
      }.toMap
      val dt = sliced.filter(_._1 % 100 == 3).flatMap { case (qid, q) =>
        cents.map { case (cid, c) =>
          (qid, cid) -> r6(dot(q, q) - 2 * dot(q, c) + dot(c, c)) }
      }.toMap
      (codes, dt)
    } match { case Seq((codes0, dt0), (codes1, dt1)) =>
      val qids = all.map(_._1).filter(_ % 100 == 3)
      qids.flatMap { qid =>
        all.map(_._1).filter(_ != qid).map { id =>
          (qid, id, r6(dt0((qid, codes0(id))) + dt1((qid, codes1(id)))))
        }.sortBy { case (_, id, adc) => (adc, id) }.take(k).zipWithIndex
          .map { case ((q, id, adc), i) => Seq[Any](q, id, adc, i + 1) }
      }
    }
    val got = graft.queries.SimilarityQueries.q84.run(spark, dir)
    assertSameRows(got, expected)
  }

  test("IVFPQ = PQ restricted to the query's coarse cell") {
    // sf0.01: 10 coarse cells, so the restriction actually bites
    val d01 = "/root/testdata/sf0.01"
    val emb = spark.read.parquet(s"$d01/embeddings.parquet")
    val cells = Similarity.ivfCells(emb, "vec_id", "embedding",
        org.apache.spark.sql.functions.col("vec_id") % 50 === 7)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pq = graft.queries.SimilarityQueries.q84.run(spark, d01)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val ivfpq = graft.queries.SimilarityQueries.q90.run(spark, d01)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ivfpq.nonEmpty)
    ivfpq.foreach { case (qid, id, adc) =>
      assert(cells(qid) == cells(id),
        s"($qid,$id) crossed cells ${cells(qid)} vs ${cells(id)}")
      // where PQ also ranked the pair, the ADC distances agree
      pq.get((qid, id)).foreach(d => assert(d == adc, s"($qid,$id)"))
    }
  }

  test("q102 confusion matrix matches brute-force nearest-centroid") {
    val rows = sf("embeddings", dir)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2))).toSeq
    val cents = rows.groupBy(_._3).view.mapValues { g =>
      Array.tabulate(64)(p => r6(g.map(_._2(p)).sum / g.size))
    }.toSeq.map { case (l, c) => (l.toLong, c) }
    val expected = rows
      .map { case (_, e, label) =>
        val pred = cents.map { case (cid, c) =>
          (dot(c, c) - 2 * dot(e, c), cid) }.min._2
        (label, pred)
      }
      .groupBy(identity).toSeq
      .map { case ((l, p), g) => Seq[Any](l, p, g.size.toLong) }
    assertSameRows(graft.queries.SimilarityQueries.q102.run(spark, dir),
      expected)
  }

  test("PQ top-k overlaps the exact euclidean top-k (recall floor)") {
    val all = vecs
    val q = all.find(_._1 % 100 == 3).get
    val exact = all.filter(_._1 != q._1).map { case (id, e) =>
      val d = dot(q._2, q._2) - 2 * dot(q._2, e) + dot(e, e)
      (d, id)
    }.sorted.take(k).map(_._2).toSet
    val approx = graft.queries.SimilarityQueries.q84.run(spark, dir)
      .filter(col("qid") === q._1).collect().map(_.getLong(1)).toSet
    val recall = exact.intersect(approx).size.toDouble / k
    assert(recall >= 0.3, s"PQ recall@$k = $recall below floor")
  }
}
