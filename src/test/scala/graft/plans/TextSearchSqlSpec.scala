package graft.plans

import graft.SparkSpec
import graft.ops.TextIndexStore
import org.apache.spark.sql.functions._

/** The SQL front door must be the SAME serving kernel: `text_search`
  * rows equal to the DataFrame `bm25` frame bit-for-bit on plain and
  * bucketed stores, SQL-side ranking equal to the DataFrame chain,
  * and malformed calls loud.
  */
class TextSearchSqlSpec extends SparkSpec {

  private val terms = Seq("join", "vector", "stream")
  private lazy val docs = sf("documents").select("doc_id", "text")
  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("text-sql").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("SQL == DataFrame on a plain store; ORDER BY/LIMIT composes; " +
      "a bucketed store serves identically through the catalog-" +
      "detected layout; malformed calls are loud") {
    val st = TextIndexStore.build(docs, "doc_id", "text",
      s"$tmp/plain")
    val sql = spark.sql(s"SELECT * FROM text_search('${st.dir}', " +
      "'doc_id', 'join vector stream')")
    assert(rows(sql) == rows(TextIndexStore.bm25(spark, st, terms)),
      "SQL rows diverged from the DataFrame serve")
    // comma separation is the same query
    assert(rows(spark.sql(s"SELECT * FROM text_search('${st.dir}', " +
        "'doc_id', 'join,vector,stream')")) == rows(sql),
      "comma-separated terms diverged")
    // SQL-side ranking equals the DataFrame chain (ordered compare)
    val sqlTop = spark.sql(s"SELECT doc_id, score FROM text_search(" +
        s"'${st.dir}', 'doc_id', 'join vector stream') " +
        "ORDER BY score DESC, doc_id LIMIT 20")
      .collect().toSeq
    val dfTop = TextIndexStore.bm25(spark, st, terms)
      .orderBy(col("score").desc, col("doc_id").asc).limit(20)
      .collect().toSeq
    assert(sqlTop == dfTop, "SQL top-k diverged from the DataFrame " +
      "ordered chain")
    // bucketed store: forDir detects the catalog layout and the SQL
    // door serves the same rows
    val bst = TextIndexStore.build(docs, "doc_id", "text",
      s"$tmp/bucketed", bucketPostings = 2)
    assert(TextIndexStore.forDir(spark, bst.dir, "doc_id")
        .postingsBuckets == 2,
      "forDir did not detect the bucketed layout from the catalog")
    assert(rows(spark.sql(s"SELECT * FROM text_search('${bst.dir}', " +
        "'doc_id', 'join vector stream')")) ==
      rows(TextIndexStore.bm25(spark, bst, terms)),
      "bucketed SQL rows diverged from the DataFrame serve")
    // loud errors: arity, empty terms, non-literal directory
    val eArity = intercept[Exception] {
      spark.sql(s"SELECT * FROM text_search('${st.dir}', 'doc_id')")
        .collect()
    }
    assert(eArity.getMessage.contains("3 arguments"),
      s"arity error not loud: ${eArity.getMessage}")
    val eTerms = intercept[Exception] {
      spark.sql(s"SELECT * FROM text_search('${st.dir}', 'doc_id', " +
        "' , ')").collect()
    }
    assert(eTerms.getMessage.contains("non-empty"),
      s"empty-terms error not loud: ${eTerms.getMessage}")
    val eLit = intercept[Exception] {
      spark.sql("SELECT * FROM text_search(doc_id, 'doc_id', 'x')")
        .collect()
    }
    assert(eLit.getMessage.toLowerCase.contains("literal") ||
      eLit.getMessage.toLowerCase.contains("unresolved"),
      s"non-literal error not loud: ${eLit.getMessage}")
  }

  test("text_match == matchAtLeast (default m = AND); text_phrase " +
      "== phraseMatch at slop 0 and proximityMatch past it; the " +
      "slop-1 boundary meets the phrase") {
    val st = TextIndexStore.build(docs, "doc_id", "text",
      s"$tmp/match")
    assert(rows(spark.sql(s"SELECT * FROM text_match('${st.dir}', " +
        "'doc_id', 'join vector stream', 2)")) ==
      rows(TextIndexStore.matchAtLeast(spark, st, terms, m = 2)),
      "quorum SQL rows diverged")
    assert(rows(spark.sql(s"SELECT * FROM text_match('${st.dir}', " +
        "'doc_id', 'join vector stream')")) ==
      rows(TextIndexStore.matchAtLeast(spark, st, terms,
        m = terms.size)),
      "default-m (AND) SQL rows diverged")
    val phrase = Seq("small", "query", "line")
    assert(rows(spark.sql(s"SELECT * FROM text_phrase('${st.dir}', " +
        "'doc_id', 'small query line')")) ==
      rows(TextIndexStore.phraseMatch(spark, st, phrase)),
      "phrase SQL rows diverged")
    assert(rows(spark.sql(s"SELECT * FROM text_phrase('${st.dir}', " +
        "'doc_id', 'small query line', 3)")) ==
      rows(TextIndexStore.proximityMatch(spark, st, phrase, slop = 3)),
      "proximity SQL rows diverged")
    // the boundary identity: slop = 1 IS the exact phrase
    assert(rows(spark.sql(s"SELECT * FROM text_phrase('${st.dir}', " +
        "'doc_id', 'small query line', 1)")) ==
      rows(spark.sql(s"SELECT * FROM text_phrase('${st.dir}', " +
        "'doc_id', 'small query line')")),
      "slop-1 proximity != exact phrase through the SQL door")
    val eM = intercept[Exception] {
      spark.sql(s"SELECT * FROM text_match('${st.dir}', 'doc_id', " +
        "'a b', 'two')").collect()
    }
    assert(eM.getMessage.contains("integer literal"),
      s"non-integer m not loud: ${eM.getMessage}")
  }
}
