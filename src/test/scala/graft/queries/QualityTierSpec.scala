package graft.queries

import graft.SparkSpec

/** Semantic pins for the corpus-hygiene tier (q82, q83, q85):
  * brute-force recomputation in plain Scala over sf0.001,
  * independent of both the Spark plan and the DuckDB oracle.
  */
class QualityTierSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs: Seq[(Long, String, Long)] =
    sf("documents", dir).select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q82 rewrite keeps exactly the first occurrence of every chunk") {
    val chunks = docs.flatMap { case (id, t, _) =>
      t.split(' ').grouped(8).zipWithIndex.map { case (c, i) =>
        (id, i.toLong, c.mkString(" ")) }
    }
    val firstOwner = chunks.groupBy(_._3).view
      .mapValues(g => g.map(c => (c._1, c._2)).min).toMap
    val expected = chunks.groupBy(_._1).toSeq.map { case (id, cs) =>
      val kept = cs.sortBy(_._2)
        .filter(c => firstOwner(c._3) == ((c._1, c._2)))
      Seq[Any](id, cs.size.toLong,
        (cs.size - kept.size).toLong, kept.map(_._3).mkString(" "))
    }
    assertSameRows(TextQueries.q82.run(spark, dir), expected)
    // the fixture must actually exercise removal
    assert(expected.exists(_(2).asInstanceOf[Long] > 0))
  }

  test("q83 rule verdicts match brute force and the keep conjunction") {
    val expected = docs.map { case (id, t, nc) =>
      val toks = t.split(' ')
      val nw = toks.length.toLong
      val mwl = r4((nc - nw + 1).toDouble / nw)
      val dup = r4(1.0 - toks.distinct.length.toDouble / nw)
      val top = r4(toks.groupBy(identity).values.map(_.size).max
        .toDouble / nw)
      val (a, b, c, d) =
        (nw >= 50, mwl >= 4.0 && mwl <= 10.0, dup <= 0.5, top <= 0.2)
      Seq[Any](id, nw, mwl, dup, top, a, b, c, d, a && b && c && d)
    }
    assertSameRows(TextQueries.q83.run(spark, dir), expected)
  }

  test("q91 keeps exactly the 5 hash-least docs per language") {
    val langs = sf("documents", dir).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): String = {
      md.reset()
      java.util.HexFormat.of()
        .formatHex(md.digest(id.toString.getBytes("UTF-8")))
    }
    val expected = langs.groupBy(_._2).toSeq.flatMap { case (lang, g) =>
      g.map(_._1).sortBy(id => (h(id), id)).take(5).zipWithIndex
        .map { case (id, i) => Seq[Any](lang, i + 1, id) }
    }
    assertSameRows(TextQueries.q91.run(spark, dir), expected)
  }

  test("q92 OOV rate matches brute force against the top-100 vocab") {
    val d = docs
    val counts = d.flatMap(_._2.split(' '))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(100).map(_._1).toSet
    val expected = d.map { case (id, t, _) =>
      val toks = t.split(' ')
      val oov = toks.count(!vocab.contains(_)).toLong
      Seq[Any](id, toks.length.toLong, oov, r4(oov.toDouble / toks.length))
    }
    assertSameRows(TextQueries.q92.run(spark, dir), expected)
  }

  test("q95 PMI matches brute force (counts, ratio, ln, rounding)") {
    val texts = docs.map(_._2)
    val uni = texts.flatMap(_.split(' '))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = texts.flatMap(t => t.split(' ').sliding(2).collect {
      case Array(a, b) => (a, b) })
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (n1, n2) = (uni.values.sum, bi.values.sum)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = bi.toSeq.filter(_._2 >= 5).map { case ((a, b), c2) =>
      (a, b, c2, r6(math.log(
        (c2 * n1 * n1).toDouble / (n2 * uni(a) * uni(b)))))
    }.sortBy { case (a, b, _, pmi) => (-pmi, a, b) }.take(20)
      .map { case (a, b, c2, pmi) => Seq[Any](a, b, c2, pmi) }
    assert(expected.nonEmpty, "fixture must yield collocations")
    assertSameRows(TextQueries.q95.run(spark, dir), expected)
  }

  test("q99 draws exactly the rounded quota per language, hash-first") {
    val langs = sf("documents", dir).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): String = {
      md.reset()
      java.util.HexFormat.of()
        .formatHex(md.digest(id.toString.getBytes("UTF-8")))
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byLang = langs.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val z = byLang.values.map(g => math.sqrt(g.size)).sum
    val expected = byLang.toSeq.flatMap { case (lang, ids) =>
      val quota = BigDecimal(r6(math.sqrt(ids.size) / z) * 200)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toInt
      ids.sortBy(id => (h(id), id)).take(quota).zipWithIndex
        .map { case (id, i) => Seq[Any](lang, quota, i + 1, id) }
    }
    assertSameRows(TextQueries.q99.run(spark, dir), expected)
  }

  test("q100 is exactly q43's strong pairs that straddle q44's split") {
    val d01 = "/root/testdata/sf0.01" // sf0.001 has no planted near-dups
    val md = java.security.MessageDigest.getInstance("MD5")
    def split(id: Long): String = {
      md.reset()
      val hex = java.util.HexFormat.of()
        .formatHex(md.digest(id.toString.getBytes("UTF-8")))
      java.lang.Long.parseLong(hex.take(8), 16) % 100 match {
        case 0 => "val"; case 1 => "test"; case _ => "train"
      }
    }
    val strong = TextQueries.q43.run(spark, d01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(_._3 >= 0.5)
    val expected = strong
      .filter { case (a, b, _) => split(a) != split(b) }
      .map { case (a, b, e) =>
        Seq[Any](a, b, split(a), split(b), e) }.toSeq
    assert(strong.nonEmpty, "fixture must have strong near-dup pairs")
    assertSameRows(TextQueries.q100.run(spark, d01), expected)
  }

  test("q101 per-doc NLL matches a brute-force bigram LM") {
    val d = docs
    val uni = d.flatMap(_._2.split(' '))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val v = uni.size.toLong
    val bi = d.flatMap(_._2.split(' ').sliding(2).collect {
      case Array(a, b) => (a, b) })
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = d.map { case (id, t, _) =>
      val toks = t.split(' ')
      val terms = toks.sliding(2).collect { case Array(a, b) =>
        math.log((uni(a) + v).toDouble / (bi((a, b)) + 1)) }.toSeq
      Seq[Any](id, terms.size.toLong,
        r4(terms.sum / terms.size))
    }
    assertSameRows(TextQueries.q101.run(spark, dir), expected)
  }

  test("q108 calibration: true jaccard is truth, estimator is unbiased-ish") {
    // brute-force true jaccard for the candidate pairs at sf0.01
    // (sf0.001 has no planted near-dups)
    val d01 = "/root/testdata/sf0.01"
    val texts = sf("documents", d01).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(t: String): Set[String] =
      t.split(' ').sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    val got = TextQueries.q108.run(spark, d01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.nonEmpty)
    got.foreach { case (a, b, est, tj, err) =>
      val (sa, sb) = (shingles(texts(a)), shingles(texts(b)))
      val truth = sa.intersect(sb).size.toDouble /
        sa.union(sb).size
      assert(r4(truth) == tj, s"($a,$b): $tj vs ${r4(truth)}")
      assert(r4(math.abs(est - tj)) == err)
      assert(est >= 0 && est <= 1 && tj >= 0 && tj <= 1)
    }
    // 16-hash estimator std ≈ sqrt(j(1−j)/16) ≤ 0.125: the mean
    // absolute error over candidates must sit well inside it
    val mean = got.map(_._5).sum / got.length
    assert(mean <= 0.15, s"mean abs err $mean")
  }

  test("q85 exact column is truth; CMS estimate within the eps bound") {
    val counts = docs.flatMap(_._2.split(' '))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = counts.values.sum
    val top = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
    val got = TextQueries.q85.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(g => g._1 -> g._2).toSeq == top)
    val bound = math.ceil(0.001 * n).toLong
    got.foreach { case (t, exact, est) =>
      assert(est >= exact, s"CMS underestimated $t")
      assert(est - exact <= bound, s"$t: est $est vs exact $exact > $bound")
    }
  }
}
