package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Brute-force pin of the hashed linear quality classifier (q117):
  * bucketing, the md5 weight table, the integer micro-unit score and
  * the sigmoid link are recomputed in plain Scala (java
  * MessageDigest), independent of both engines. Plus both signs of
  * the half-away-from-zero branch on planted tokens.
  */
class ClassifierSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val Buckets = 4096

  private def md32(s: String): Long = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  private def weight(b: Long): Long = md32(s"w,$b") % 2001 - 1000

  private def score(tokens: Seq[String]): (Long, Long, Long) = {
    val sw = tokens.map(t => weight(md32(t) % Buckets)).sum
    val n = tokens.size.toLong
    val micro =
      if (sw >= 0) (sw * 2000 + n) / (2 * n)
      else -(((-sw) * 2000 + n) / (2 * n))
    (n, sw, micro)
  }

  test("qualityClassify matches a plain-Scala md5 reimplementation") {
    val docs = sf("documents", dir)
    val got = TextOps.qualityClassify(docs, "doc_id", "text", Buckets)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    val raw = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(raw.nonEmpty && got.size == raw.length)
    raw.foreach { case (id, text) =>
      val (n, sw, micro) = score(text.split(' ').toSeq)
      val s = micro / 1000000.0
      val prob = BigDecimal(1.0 / (1.0 + math.exp(-s)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) == ((n, s, prob, sw >= 0)), s"doc $id")
    }
  }

  test("micro-unit rounding is half-away-from-zero on BOTH signs") {
    // plant tokens with known weights: find one positive, one negative
    val cand = (0 until 10000).map(i => s"t$i")
    val neg = cand.find(t => weight(md32(t) % Buckets) < 0).get
    val pos = cand.find(t => weight(md32(t) % Buckets) > 0).get
    import spark.implicits._
    val df = Seq(1L -> s"$pos $pos", 2L -> s"$neg $neg").toDF("doc_id", "text")
    val out = TextOps.qualityClassify(df, "doc_id", "text", Buckets)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getBoolean(4))).toMap
    val (_, swP, microP) = score(Seq(pos, pos))
    val (_, swN, microN) = score(Seq(neg, neg))
    assert(swP > 0 && swN < 0, "planted signs")
    assert(out(1L) == ((microP / 1000000.0, true)))
    assert(out(2L) == ((microN / 1000000.0, false)))
    assert(microN == -(((-swN) * 2000 + 2) / 4),
      "negative branch must round away from zero")
  }

  test("model vector is fixed-size and broadcastable") {
    val m = TextOps.hashedModel(spark, Buckets).collect()
    assert(m.length == Buckets)
    assert(m.forall(r => math.abs(r.getLong(1)) <= 1000))
    // non-degenerate: both signs present
    assert(m.exists(_.getLong(1) > 0) && m.exists(_.getLong(1) < 0))
  }
}
