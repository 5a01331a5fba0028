package graft.plans

import graft.SparkSpec
import graft.ops.AsOf
import org.apache.spark.sql.functions._

/** The `asof_join` SQL table function must be the SAME operator as
  * the DataFrame API — one logical node, two front doors: result
  * equality on both argument styles (TABLE(...) subplans and
  * view-name string literals), both directions, tolerance, the
  * merge-walk physical plan, and loud errors on misuse.
  */
class AsOfSqlSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private lazy val fixtures: Unit = {
    val rnd = new scala.util.Random(5)
    Seq.tabulate(400)(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(300).toLong, i.toLong))
      .toDF("k", "t", "lid").createOrReplaceTempView("asof_l")
    Seq.tabulate(300)(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(300).toLong, i.toLong))
      .toDF("k", "t", "rid").createOrReplaceTempView("asof_r")
  }

  test("TABLE(...) arguments: SQL == DataFrame, backward and forward") {
    fixtures
    val l = spark.table("asof_l"); val r = spark.table("asof_r")
    val back = spark.sql(
      "SELECT * FROM asof_join(TABLE(asof_l), TABLE(asof_r), 'k', 't')")
    assert(rows(back) == rows(AsOf.asofJoinNative(l, r, "k", "t")))
    assert(back.count() == 400)
    val fwd = spark.sql("SELECT * FROM asof_join(TABLE(asof_l), " +
      "TABLE(asof_r), 'k', 't', 'forward')")
    assert(rows(fwd) == rows(AsOf.asofJoinNativeForward(l, r, "k", "t")))
    // a TABLE(SELECT ...) subquery argument works too
    val sub = spark.sql("SELECT * FROM asof_join(" +
      "TABLE(SELECT * FROM asof_l WHERE k < 5), TABLE(asof_r), 'k', 't')")
    assert(rows(sub) ==
      rows(AsOf.asofJoinNative(l.filter(col("k") < 5), r, "k", "t")))
  }

  test("view-name string arguments and tolerance: SQL == DataFrame") {
    fixtures
    val l = spark.table("asof_l"); val r = spark.table("asof_r")
    val named = spark.sql(
      "SELECT * FROM asof_join('asof_l', 'asof_r', 'k', 't')")
    assert(rows(named) == rows(AsOf.asofJoinNative(l, r, "k", "t")))
    val tol = spark.sql("SELECT * FROM asof_join('asof_l', 'asof_r', " +
      "'k', 't', 'backward', 7)")
    assert(rows(tol) ==
      rows(AsOf.asofJoinNative(l, r, "k", "t", tolerance = Some(7L))))
    // the tolerance really bites on this fixture
    assert(tol.filter(col("rid").isNull).count() >
      named.filter(col("rid").isNull).count())
  }

  test("the SQL path plans the same merge-walk exec") {
    fixtures
    val df = spark.sql(
      "SELECT * FROM asof_join(TABLE(asof_l), TABLE(asof_r), 'k', 't')")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"),
      s"SQL path did not plan the native exec:\n$plan")
  }

  test("misuse fails loudly") {
    fixtures
    val eDir = intercept[Exception] {
      spark.sql("SELECT * FROM asof_join('asof_l', 'asof_r', 'k', 't', " +
        "'sideways')").collect()
    }
    assert(eDir.getMessage.contains("direction"))
    val eArity = intercept[Exception] {
      spark.sql("SELECT * FROM asof_join('asof_l', 'asof_r')").collect()
    }
    assert(eArity.getMessage.contains("4 to 6") ||
      eArity.getMessage.toLowerCase.contains("argument"))
    val eCol = intercept[Exception] {
      spark.sql("SELECT * FROM asof_join('asof_l', 'asof_r', 'nope', " +
        "'t')").collect()
    }
    assert(eCol.getMessage.contains("nope"))
  }
}
