package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Expression-level contract of [[UnicodeNormalize]]: canonical
  * composition/decomposition, compatibility folding, null semantics,
  * non-BMP safety, SQL registration and analysis-time validation.
  * (q153 oracles the NFC form end-to-end against DuckDB's
  * `nfc_normalize`.)
  */
class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String, form: String): String =
    Seq(s).toDF("t")
      .select(UnicodeNormalize(col("t"), form)).collect()(0).getString(0)

  test("NFC composes; NFD decomposes; NFKC folds compatibility forms") {
    val decomposed = "Café"             // e + combining acute
    val composed = "Café"                // é
    assert(norm(decomposed, "NFC") == composed)
    assert(norm(composed, "NFD") == decomposed)
    // ligature ﬁ and fullwidth Ａ are NFKC compatibility equivalents
    assert(norm("ﬁle Ａ", "NFKC") == "file A")
    // NFC leaves them alone — canonical, not compatibility
    assert(norm("ﬁle Ａ", "NFC") == "ﬁle Ａ")
  }

  test("idempotent on normalized input; null propagates") {
    assert(norm("plain ascii", "NFC") == "plain ascii")
    assert(norm("Café", "NFC") == "Café")
    val r = Seq(Option.empty[String]).toDF("t")
      .select(UnicodeNormalize(col("t"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("non-BMP text survives: emoji with combining marks") {
    // U+1F600 (surrogate pair) next to a decomposed sequence — the
    // normalizer must compose the diacritic without corrupting the
    // astral-plane code point
    val s = "😀 née"
    val out = norm(s, "NFC")
    assert(out == "😀 née")
    assert(out.codePointCount(0, out.length) == 5)
  }

  test("registered as a SQL function; form argument honored") {
    Seq("Café").toDF("t").createOrReplaceTempView("un_spec")
    try {
      val c = spark.sql(
        "SELECT unicode_normalize(t) AS n FROM un_spec").collect()
      assert(c(0).getString(0) == "Café")
      val d = spark.sql(
        "SELECT unicode_normalize(unicode_normalize(t), 'NFD') AS n " +
          "FROM un_spec").collect()
      assert(d(0).getString(0) == "Café")
    } finally spark.catalog.dropTempView("un_spec")
  }

  test("analysis-time rejection: non-string input, invalid form") {
    val e1 = intercept[Exception] {
      Seq(1L).toDF("x").select(UnicodeNormalize(col("x"))).collect()
    }
    assert(e1.getMessage.contains("unicode_normalize") ||
      e1.getMessage.toLowerCase.contains("data type"))
    val e2 = intercept[Exception] {
      Seq("a").toDF("t")
        .select(UnicodeNormalize(col("t"), "NFX")).collect()
    }
    assert(e2.getMessage.contains("NFX") ||
      e2.getMessage.contains("unicode_normalize"))
    // a foldable NULL form must be the clear registration error, not
    // an NPE inside the builder
    Seq("a").toDF("t").createOrReplaceTempView("un_null_spec")
    try {
      val e3 = intercept[Exception] {
        spark.sql("SELECT unicode_normalize(t, CAST(NULL AS STRING)) " +
          "FROM un_null_spec").collect()
      }
      assert(e3.getMessage.contains("must not be NULL") ||
        e3.getMessage.contains("unicode_normalize"))
    } finally spark.catalog.dropTempView("un_null_spec")
  }
}
