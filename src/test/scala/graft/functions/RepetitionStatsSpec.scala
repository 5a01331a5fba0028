package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The expression-level contract of [[RepetitionStats]] (TextOps'
  * kernel is covered end-to-end in OpsSpec; this spec owns the raw
  * expression: null semantics, SQL registration, type checking).
  */
class RepetitionStatsSpec extends SparkSpec {
  import spark.implicits._

  test("struct fields match the hand computation; null input yields " +
      "a null struct (callers coalesce)") {
    val df = Seq(Some("a b a b a b"), None).toDF("text")
      .select(RepetitionStats(col("text")).as("rs"))
    val rows = df.collect()
    assert(rows(0).getStruct(0).getLong(0) == 11L) // n_chars
    assert(rows(0).getStruct(0).getLong(1) == 9L)  // top2
    assert(rows(0).getStruct(0).getLong(2) == 20L) // dup3
    assert(rows(1).isNullAt(0))
  }

  test("registered as a SQL function by GraftExtensions") {
    Seq(("a b a b a b")).toDF("text").createOrReplaceTempView("rs_spec")
    try {
      val r = spark.sql(
        "SELECT repetition_stats(text).top2_chars AS t FROM rs_spec")
        .collect()
      assert(r.head.getLong(0) == 9L)
    } finally spark.catalog.dropTempView("rs_spec")
  }

  test("non-string input is an analysis-time error") {
    val e = intercept[Exception] {
      Seq(1L).toDF("x").select(RepetitionStats(col("x"))).collect()
    }
    assert(e.getMessage.contains("repetition_stats") ||
      e.getMessage.toLowerCase.contains("data type"))
  }
}
