package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Bloom pre-filter's load-bearing guarantees: NO false negative
  * ever (a `false` is safe to skip the exact check), a bounded
  * false-positive tail, and a bitmap that stays m/32 rows no matter
  * the corpus (the broadcast-ability contract).
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val m = 1024
  private val k = 3

  test("no false negatives: every inserted key probes member=true") {
    val corpus = (0 until 300).map(i => s"key-$i").toDF("key")
    val bloom = Bloom.build(corpus, "key", m, k)
    val got = Bloom.probe(corpus.withColumn("id", col("key")),
        Seq("id"), "key", bloom, m, k)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got.size == 300)
    assert(got.values.forall(identity), "an inserted key probed false")
  }

  test("false positives exist but stay under the analytic bound") {
    val corpus = (0 until 300).map(i => s"key-$i").toDF("key")
    val bloom = Bloom.build(corpus, "key", m, k)
    val fresh = (0 until 1000).map(i => s"other-$i").toDF("key")
    val fp = Bloom.probe(fresh.withColumn("id", col("key")),
        Seq("id"), "key", bloom, m, k)
      .filter(col("member")).count()
    // (1 − e^(−kn/m))^k at n=300, m=1024, k=3 ≈ 0.21; allow 2× slack
    assert(fp.toDouble / 1000 <= 0.42, s"fp rate ${fp / 1000.0}")
    assert(fp > 0, "suspiciously perfect — probe path likely broken")
  }

  test("merge(A,B) answers like build(A ++ B) — incremental maintenance") {
    val a = (0 until 100).map(i => s"a-$i").toDF("key")
    val b = (0 until 100).map(i => s"b-$i").toDF("key")
    val merged = Bloom.merge(Bloom.build(a, "key", m, k),
      Bloom.build(b, "key", m, k))
    val direct = Bloom.build(a.unionByName(b), "key", m, k)
    // the bitmaps themselves are identical, not just the decisions
    assert(merged.orderBy("word").collect().toSeq ==
      direct.orderBy("word").collect().toSeq)
  }

  test("bitmap is at most m/32 rows regardless of corpus size") {
    val corpus = (0 until 5000).map(i => s"key-$i").toDF("key")
    val rows = Bloom.build(corpus, "key", m, k).collect()
    assert(rows.length <= m / 32)
    // every word index in range, every bits payload fits 32 bits
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < m / 32)
      assert((r.getLong(1) & ~0xffffffffL) == 0L)
    }
  }
}
