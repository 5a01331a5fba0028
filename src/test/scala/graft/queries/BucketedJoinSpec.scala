package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Demonstrates the bucketing scale technique SURVEY.md claims for
  * co-located joins: two fact tables written `bucketBy` the join key
  * join WITHOUT any shuffle exchange — at 100 TB this is the move
  * that turns the recurring lineitem⋈orders exchange into a
  * metadata-only plan property (pay the shuffle once at write time,
  * never again per query).
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketBy'd fact tables join with zero exchanges") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft-bucketed-wh").toString
    val dir = "/root/testdata/sf0.001"
    try {
      sf("lineitem", dir).write.format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/li") // external: keep the repo warehouse clean
        .mode("overwrite").saveAsTable("li_bucketed")
      sf("orders", dir).write.format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/ord")
        .mode("overwrite").saveAsTable("ord_bucketed")
      // forbid broadcast so the claim is about co-location, not size
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val joined =
        try {
          val j = spark.table("li_bucketed")
            .join(spark.table("ord_bucketed"),
              col("l_orderkey") === col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(round(sum("l_extendedprice"), 2).as("rev"))
          j.collect()
          j
        } finally {
          spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        }
      // co-located: the join needs NO exchange of either side — the
      // ONLY hash exchange in the FINAL plan is the aggregate's
      val p = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val nEx = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(nEx == 1,
        s"expected only the aggregate exchange, found $nEx:\n$p")
      // and a real shuffle-class join ran on the bucketed layout
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        p)
      assert(p.contains("Bucketed: true"), p)
      // sanity: same result as the plain parquet join
      val plain = sf("lineitem", dir)
        .join(sf("orders", dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(round(sum("l_extendedprice"), 2).as("rev"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val bucketed = joined.collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(bucketed == plain)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      // external-path tables: DROP leaves the files — delete the dir
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      Files.walk(Path.of(wh)).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }
}
