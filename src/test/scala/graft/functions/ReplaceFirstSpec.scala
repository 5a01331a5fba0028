package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit + property tests for the custom ReplaceFirst Catalyst
  * expression (codegen and interpreted paths, UTF-8 safety, linearity
  * of the chained fold that OOM'd in its pre-expression form).
  */
class ReplaceFirstSpec extends SparkSpec {
  import spark.implicits._

  private def rf(s: String, pat: String, repl: String): String =
    Seq(s).toDF("s")
      .select(ReplaceFirst(col("s"), pat, repl)).head().getString(0)

  test("replaces only the first occurrence") {
    assert(rf("aXbXc", "X", "-") == "a-bXc")
    assert(rf("DKNN DKNN", "DKNN", "DKNG") == "DKNG DKNN")
  }

  test("no match / empty pattern / empty input") {
    assert(rf("abc", "z", "-") == "abc")
    assert(rf("abc", "", "-") == "abc") // empty pattern is identity
    assert(rf("", "x", "-") == "")
  }

  test("multi-byte UTF-8 safe") {
    assert(rf("héllo wörld wörld", "wörld", "木") == "héllo 木 wörld")
    assert(rf("日本語テスト日本語", "日本語", "") == "テスト日本語")
  }

  test("null propagates") {
    val out = Seq[(String, Int)](((null: String), 1)).toDF("s", "i")
      .select(ReplaceFirst(col("s"), "x", "y")).head()
    assert(out.isNullAt(0))
  }

  test("50-step fold stays linear (the round-1 OOM shape)") {
    val chained = (0 until 50).foldLeft(col("s")) { (acc, i) =>
      ReplaceFirst(acc, s"p$i", s"r$i")
    }
    // planning + execution must both succeed quickly
    val out = Seq("p0 p1 p2 p49").toDF("s").select(chained.as("out"))
      .head().getString(0)
    assert(out == "r0 r1 r2 r49")
  }

  test("property: matches literal first-occurrence splice semantics") {
    // one Spark job over 500 seeded random (s, p, r) cases, incl.
    // multi-byte chars; expectation computed via String.indexOf
    val rnd = new scala.util.Random(42)
    val alphabet = "abü本"
    def mk(n: Int) =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val cases = (0 until 500).map(_ => (mk(12), mk(2), mk(2)))
    val got = cases.toDF("s", "p", "r")
      .select(col("s"), col("p"), col("r"),
        ReplaceFirst(col("s"), col("p"), col("r")).as("out"))
      .collect()
    got.foreach { row =>
      val (s, p, r) = (row.getString(0), row.getString(1), row.getString(2))
      val i = s.indexOf(p)
      val expect =
        if (i < 0) s else s.substring(0, i) + r + s.substring(i + p.length)
      assert(row.getString(3) == expect, s"s=$s p=$p r=$r")
    }
    assert(got.length == 500)
  }
}
