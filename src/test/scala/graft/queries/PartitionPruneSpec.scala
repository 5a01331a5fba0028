package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition pruning — the other half of the layout story next to
  * bucketing (BucketedJoinSpec) and Z-order (q89): a predicate on the
  * partition column must be resolved from directory metadata, never
  * by scanning data. At 100 TB this is the difference between
  * reading one day and reading three years. Asserted two ways: the
  * plan carries the predicate as a PartitionFilter (not a data
  * filter), and the measured bytes read shrink to ~one partition's
  * worth.
  */
class PartitionPruneSpec extends SparkSpec {

  private class BytesListener
      extends org.apache.spark.scheduler.SparkListener {
    @volatile var bytes = 0L
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      if (te.taskMetrics != null)
        synchronized { bytes += te.taskMetrics.inputMetrics.bytesRead }
  }

  private def bytesReadOf(body: => Unit): Long = {
    val l = new BytesListener
    spark.sparkContext.addSparkListener(l)
    try {
      body
      org.apache.spark.sql.graft.Shims.flushListenerBus(spark.sparkContext)
      l.bytes
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("a partition-column predicate prunes to one directory") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-prune").toString
    try {
      sf("events", "/root/testdata/sf0.001")
        .write.partitionBy("event_type").mode("overwrite").parquet(dir)
      val df = spark.read.parquet(dir)
        .filter(col("event_type") === "purchase")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      var n = -1L
      val prunedBytes = bytesReadOf { n = df.collect()(0).getLong(0) }
      // the predicate must land in PartitionFilters (metadata
      // pruning), not DataFilters/PushedFilters (data-page work)
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val scan = p.linesIterator
        .find(_.contains("PartitionFilters")).getOrElse("")
      assert(scan.contains("PartitionFilters: [isnotnull(event_type"),
        p)
      assert(scan.contains("DataFilters: []"), p)
      // and the physical read is ~one partition of five, not the lot
      val fullBytes = bytesReadOf {
        spark.read.parquet(dir)
          .agg(count(lit(1)), round(sum("value"), 2)).collect()
      }
      assert(prunedBytes > 0 && prunedBytes < fullBytes / 3,
        s"pruned=$prunedBytes full=$fullBytes")
      // correctness of the pruned read
      val truth = sf("events", "/root/testdata/sf0.001")
        .filter(col("event_type") === "purchase").count()
      assert(n == truth)
    } finally {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      Files.walk(Path.of(dir)).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    }
  }
}
