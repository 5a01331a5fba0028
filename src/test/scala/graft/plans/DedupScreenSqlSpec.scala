package graft.plans

import graft.SparkSpec
import graft.ops.CurationStore
import org.apache.spark.sql.functions._

/** The admission screen's SQL door must be the SAME decision kernel:
  * `dedup_screen` / `dedup_screen_attributed` row-identical to the
  * DataFrame forms (which also proves the SQL door screens under the
  * store's PERSISTED dials — the DataFrame side defaults to them),
  * and malformed calls loud.
  */
class DedupScreenSqlSpec extends SparkSpec {

  private lazy val docs = sf("documents").select("doc_id", "text")
  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("screen-sql").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("SQL == DataFrame for plain and attributed screens; banding " +
      "rides the store's own dials; malformed calls are loud") {
    // non-default banding: the SQL door has no banding arguments, so
    // equality with the DataFrame default (= stored dials) proves
    // the TVF screens under the store's criteria
    val st = CurationStore.build(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", s"$tmp/store", numHashes = 16, numBands = 16,
      minEst = 0.3)
    docs.filter(col("doc_id") % 2 === 1)
      .createOrReplaceTempView("screen_sql_batch")
    val batch = spark.table("screen_sql_batch")
    assert(rows(spark.sql(s"SELECT * FROM dedup_screen('${st.dir}', " +
        "'doc_id', 'screen_sql_batch', 'text')")) ==
      rows(CurationStore.screen(spark, st, batch, "text")),
      "dedup_screen diverged from the DataFrame screen")
    assert(rows(spark.sql("SELECT * FROM dedup_screen_attributed(" +
        s"'${st.dir}', 'doc_id', 'screen_sql_batch', 'text')")) ==
      rows(CurationStore.screenAttributed(spark, st, batch, "text")),
      "dedup_screen_attributed diverged from the DataFrame screen")
    // filtering composes in SQL and the statuses are the real mix
    val kept = spark.sql(s"SELECT * FROM dedup_screen('${st.dir}', " +
      "'doc_id', 'screen_sql_batch', 'text') " +
      "WHERE status = 'kept'").count()
    val all = batch.count()
    assert(kept > 0 && kept < all,
      s"fixture not sharp through the SQL door: $kept of $all kept")
    // malformed calls fail loudly with the function's name
    val e1 = intercept[Exception] {
      spark.sql(s"SELECT * FROM dedup_screen('${st.dir}', 'doc_id')")
    }
    assert(e1.getMessage.contains("dedup_screen"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM dedup_screen_attributed(" +
        s"'${st.dir}', 'doc_id', 'screen_sql_batch', 42)")
    }
    assert(e2.getMessage.contains("dedup_screen_attributed"),
      e2.getMessage)
  }
}
