package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic pins for the round-7 retrieval/feature tier (q74-q79):
  * each query's clever shape (bucketed equi-join, pivoted fixed-order
  * sum, broadcast moments) is checked against a brute-force
  * recomputation in plain Scala over sf0.001 — independent of both
  * the Spark plan under test and the DuckDB oracle.
  */
class RetrievalTierSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs: Seq[(Long, String)] =
    sf("documents", dir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq

  test("q74 tf-idf top-3 matches brute force") {
    val d = docs
    val n = d.size.toLong
    val tf = d.flatMap { case (id, t) =>
      t.split(" ", -1).groupBy(identity).map { case (tok, g) =>
        (id, tok, g.length.toLong) }
    }
    val df = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    def idf(tok: String): Double =
      BigDecimal(math.log((n + 1).toDouble / (df(tok) + 1)) + 1)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = tf.groupBy(_._1).flatMap { case (id, rows) =>
      rows.map { case (_, tok, f) =>
        val score = BigDecimal(f * idf(tok))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, tok, f, score)
      }.sortBy { case (_, tok, _, score) => (-score, tok) }
        .take(3).zipWithIndex
        .map { case ((i, tok, f, sc), r) => Seq[Any](i, r + 1, tok, f, sc) }
    }.toSeq
    assertSameRows(TextQueries.q74.run(spark, dir), expected)
  }

  test("q75 bm25 top-20 matches brute force") {
    val d = docs
    val terms = Seq("join", "vector", "stream")
    val n = d.size.toLong
    val dls = d.map { case (id, t) => id -> t.split(" ", -1).length.toLong }
    val avgdl = dls.map(_._2).sum.toDouble / n
    val tf = d.map { case (id, t) =>
      id -> t.split(" ", -1).groupBy(identity).view
        .mapValues(_.length.toLong).toMap
    }.toMap
    val df = terms.map(q => q -> tf.count(_._2.contains(q)).toLong).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val idf = terms.map { q =>
      q -> r6(math.log((n - df(q) + 0.5) / (df(q) + 0.5) + 1)) }.toMap
    val dlMap = dls.toMap
    val scored = d.flatMap { case (id, _) =>
      val cs = terms.map { q =>
        val f = tf(id).getOrElse(q, 0L)
        if (f == 0L) 0d
        else r6(idf(q) * (f * 2.2) /
          (f + 1.2 * (1 - 0.75 + 0.75 * dlMap(id) / avgdl)))
      }
      if (cs.forall(_ == 0d)) None
      else Some(id -> r4(cs.reduceLeft(_ + _)))
    }
    val expected = scored.sortBy { case (id, s) => (-s, id) }.take(20)
      .map { case (id, s) => Seq[Any](id, s) }
    assertSameRows(TextQueries.q75.run(spark, dir), expected)
  }

  test("q76 bucketed interval join == brute-force range join") {
    val ev = Registry.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val purchases = ev.filter(_._4 == "purchase")
    val expected = ev.filter(_._4 == "click").map { case (id, u, us, _) =>
      val m = purchases.count(p =>
        p._2 == u && p._3 > us && p._3 <= us + 600L * 1000000L)
      Seq[Any](id, m.toLong)
    }.toSeq
    assertSameRows(Relational.q76.run(spark, dir), expected)
  }

  test("q78 mixture weights: sum to ~1, tail languages upweighted") {
    val rows = TextQueries.q78.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._4).sum - 10000L) <= rows.length)
    // temperature < 1 compresses the ratio: weight ratio must be
    // strictly smaller than the count ratio for any two languages
    val byN = rows.sortBy(_._2)
    val (lo, hi) = (byN.head, byN.last)
    assert(hi._2 > lo._2, "corpus should have unequal language counts")
    assert(hi._3 / lo._3 < hi._2.toDouble / lo._2.toDouble)
  }

  test("q79 ecdf: pr bounds, monotone within lang, deciles balanced") {
    val rows = TextQueries.q79.run(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    assert(rows.forall { case (_, _, pr, d) =>
      pr >= 0.0 && pr <= 1.0 && d >= 1 && d <= 10 })
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._4))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 <= b._3 && a._4 <= b._4
        case _ => true
      }, s"$lang: pr/decile must be monotone in n_chars")
      val sizes = rs.groupBy(_._4).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"$lang: ntile must balance")
    }
  }
}
