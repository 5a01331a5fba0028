package graft.plans

import graft.SparkSpec
import graft.ops.AnnIndexStore
import org.apache.spark.sql.functions._

/** The ANN SQL front door must be the SAME serving kernel:
  * `ann_search` rows equal to the DataFrame `search` frame (plain,
  * nprobe, and filtered forms), `forDir` must recover the PQ shape
  * from the committed codebooks alone, and malformed calls loud.
  */
class AnnSearchSqlSpec extends SparkSpec {

  private lazy val emb = sf("embeddings")
  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("ann-sql").toString
  private lazy val idx = AnnIndexStore.build(emb, "vec_id", "embedding",
    s"$tmp/idx", centroidPred = col("vec_id") % 50 === 7,
    seedPred = col("vec_id") % 10 === 3, m = 2, subDim = 32, iters = 2)
  private lazy val queries = emb.filter(col("vec_id") % 100 === 3)
    .select(col("vec_id").as("qid"), col("embedding"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("ann_search == DataFrame search (default and nprobe = 2); " +
      "forDir recovers the PQ shape; malformed calls are loud") {
    queries.createOrReplaceTempView("annsql_q")
    val fd = AnnIndexStore.forDir(spark, idx.dir, "vec_id")
    assert((fd.m, fd.subDim) == ((idx.m, idx.subDim)),
      s"forDir recovered (m, subDim) = (${fd.m}, ${fd.subDim})")
    assert(rows(spark.sql(s"SELECT * FROM ann_search('${idx.dir}', " +
        "'vec_id', 'annsql_q', 'qid', 'embedding', 10)")) ==
      rows(AnnIndexStore.search(spark, idx, queries, "qid",
        "embedding", k = 10)),
      "SQL rows diverged from the DataFrame serve")
    assert(rows(spark.sql(s"SELECT * FROM ann_search('${idx.dir}', " +
        "'vec_id', 'annsql_q', 'qid', 'embedding', 10, 2)")) ==
      rows(AnnIndexStore.search(spark, idx, queries, "qid",
        "embedding", k = 10, nprobe = 2)),
      "SQL nprobe=2 rows diverged from the DataFrame serve")
    val eArity = intercept[Exception] {
      spark.sql(s"SELECT * FROM ann_search('${idx.dir}', 'vec_id')")
        .collect()
    }
    assert(eArity.getMessage.contains("6 or 7 arguments"),
      s"arity error not loud: ${eArity.getMessage}")
    val eLit = intercept[Exception] {
      spark.sql("SELECT * FROM ann_search(vec_id, 'vec_id', " +
        "'annsql_q', 'qid', 'embedding', 10)").collect()
    }
    assert(eLit.getMessage.toLowerCase.contains("literal") ||
      eLit.getMessage.toLowerCase.contains("unresolved"),
      s"non-literal error not loud: ${eLit.getMessage}")
  }

  test("ann_search_filtered == DataFrame searchFiltered, and is a " +
      "PRE-filter (fills k inside the allowed set, not a post-cut)") {
    queries.createOrReplaceTempView("annsql_q2")
    emb.filter(col("vec_id") % 3 === 0).select("vec_id")
      .createOrReplaceTempView("annsql_allow")
    val sql = spark.sql(s"SELECT * FROM ann_search_filtered(" +
      s"'${idx.dir}', 'vec_id', 'annsql_q2', 'qid', 'embedding', " +
      "'annsql_allow', 10, 2)")
    val df = AnnIndexStore.searchFiltered(spark, idx,
      emb.filter(col("vec_id") % 3 === 0).select("vec_id"),
      queries, "qid", "embedding", k = 10, nprobe = 2)
    assert(rows(sql) == rows(df),
      "filtered SQL rows diverged from the DataFrame serve")
    // pre-filter semantics: every result allowed, and NOT merely the
    // allowed subset of the unfiltered ranking (which under-fills)
    assert(sql.filter(col("vec_id") % 3 =!= 0).isEmpty,
      "disallowed ids leaked through the filtered door")
    val post = AnnIndexStore.search(spark, idx, queries, "qid",
        "embedding", k = 10, nprobe = 2)
      .filter(col("vec_id") % 3 === 0)
    assert(sql.count() > post.count(),
      "fixture degenerate: the pre-filter did not out-fill a post-cut")
  }
}
