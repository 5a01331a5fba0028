package graft

import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the minhash pipeline (not part of the
  * driver contract; run by hand while tuning).
  */
object ProfileDev {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }

    docs.count() // warm scan
    val widened = docs.repartition(32)
    time("repartition+count")(widened.count())
    val sh = widened.select(col("doc_id"),
      explode(Dedup.shingles(TextOps.tokens(col("text")), 3)).as("s"))
    time("shingle explode")(sh.count())
    time("shingle explode x2")(sh.count())
    val one = sh.groupBy("doc_id").agg(min(md5(concat(lit("0:"), col("s")))).as("h0"))
    time("1 minhash agg")(one.count())
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", 16)
    time("16 minhash aggs")(sig.count())
    val buckets = Dedup.lshBuckets(docs, "doc_id", "text", 16, 4)
    time("full lshBuckets")(buckets.count())
    time("full lshBuckets x2")(buckets.count())

    // variant: typed flatMap shingler (JIT-compiled JVM lambda)
    import spark.implicits._
    val shF = widened.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = text.split(' ')
        if (t.length < 3) Iterator.empty
        else {
          val seen = new scala.collection.mutable.HashSet[String]
          (0 to t.length - 3).iterator
            .map(i => t(i) + " " + t(i + 1) + " " + t(i + 2))
            .filter(seen.add)
            .map(s => (id, s))
        }
      }.toDF("doc_id", "s")
    time("flatMap shingles")(shF.count())
    time("flatMap shingles x2")(shF.count())
    val oneF = shF.groupBy("doc_id").agg(min(md5(concat(lit("0:"), col("s")))).as("h0"))
    time("flatMap 1 minhash agg")(oneF.count())
    val aggsF = (0 until 16).map(i => min(md5(concat(lit(s"$i:"), col("s")))).as(s"h$i"))
    val sigF = shF.groupBy(col("doc_id")).agg(aggsF.head, aggsF.tail: _*)
    time("flatMap 16 minhash aggs")(sigF.count())

    // salted join vs plain join on real tables (result must agree)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val part = spark.read.parquet(s"$dir/part.parquet")
    var plain = 0L
    time("plain join") {
      plain = li.join(part, li("l_partkey") === part("p_partkey")).count(); plain
    }
    time("salted join (8)") {
      val n = graft.ops.Skew.saltedJoin(
        li.withColumnRenamed("l_partkey", "k"),
        part.withColumnRenamed("p_partkey", "k"), "k", 8).count()
      require(n == plain, s"salted=$n plain=$plain"); n
    }
    spark.stop()
  }
}
