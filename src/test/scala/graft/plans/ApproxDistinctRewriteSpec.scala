package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, HllSketchAgg}
import org.apache.spark.sql.functions._

/** The count(DISTINCT) → HLL optimizer rule: OFF must leave plans and
  * results byte-for-byte exact; ON must actually change the PLAN
  * (sketch aggregate in the optimized plan, no Expand in the physical
  * plan for the multi-distinct case) and keep results exact in the
  * sketch's exact regime / inside ~5·RSE past it. Unsupported child
  * types must be left alone even when the flag is on.
  */
class ApproxDistinctRewriteSpec extends SparkSpec {

  private def withFlag[T](on: Boolean)(body: => T): T = {
    val prev = spark.conf.getOption(ApproxDistinctRewrite.Flag)
    spark.conf.set(ApproxDistinctRewrite.Flag, on.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ApproxDistinctRewrite.Flag, v)
      case None => spark.conf.unset(ApproxDistinctRewrite.Flag)
    }
  }

  private def hasSketchAgg(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.expressions.exists(_.exists {
      case ae: AggregateExpression =>
        ae.aggregateFunction.isInstanceOf[HllSketchAgg]
      case _ => false
    })

  private def hasDistinctAgg(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.expressions.exists(_.exists {
      case ae: AggregateExpression => ae.isDistinct
      case _ => false
    })

  test("flag off: plan untouched, exact distinct aggregate survives") {
    val df = sf("events").groupBy("event_type")
      .agg(countDistinct("user_id").as("users"))
    assert(hasDistinctAgg(df) && !hasSketchAgg(df))
  }

  test("flag on: sketch aggregate in plan, exact result in the exact regime") {
    val exact = sf("events").groupBy("event_type")
      .agg(countDistinct("user_id").as("users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    withFlag(on = true) {
      val df = sf("events").groupBy("event_type")
        .agg(countDistinct("user_id").as("users"))
      assert(hasSketchAgg(df) && !hasDistinctAgg(df),
        "rewrite did not fire")
      val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // per-group distinct users at sf0.001 sit far below the HLL
      // list/set-mode promotion point: estimates are EXACT counts
      assert(got == exact, s"exact-regime mismatch: $got vs $exact")
    }
  }

  test("flag on: estimate regime stays inside 5·RSE of the truth") {
    val n = 200000L
    val ids = spark.range(n).select((col("id") % 50000).as("v"))
    withFlag(on = true) {
      val df = ids.agg(countDistinct("v").as("d"))
      assert(hasSketchAgg(df))
      val est = df.collect().head.getLong(0)
      val tol = math.ceil(5 * 1.04 / math.sqrt(1 << 12) * 50000).toLong
      assert(math.abs(est - 50000L) <= tol, s"est $est vs 50000 ± $tol")
    }
  }

  test("flag on: multi-distinct query loses its Expand") {
    def q = sf("events").groupBy("event_type")
      .agg(countDistinct("user_id").as("u"),
        countDistinct("event_id").as("e"))
    val expandOff = q.queryExecution.executedPlan.toString
    assert(expandOff.contains("Expand"),
      "fixture invalid: exact multi-distinct should plan an Expand")
    withFlag(on = true) {
      val planOn = q.queryExecution.executedPlan.toString
      assert(!planOn.contains("Expand"),
        "rewrite should eliminate the multi-distinct Expand")
    }
  }

  test("flag on: zero-row global aggregate returns 0, not null") {
    withFlag(on = true) {
      val df = sf("events").filter(lit(false))
        .agg(countDistinct("user_id").as("d"))
      assert(hasSketchAgg(df))
      val row = df.collect().head
      assert(!row.isNullAt(0) && row.getLong(0) == 0L)
    }
  }

  test("flag on: unsupported child type is left exact") {
    withFlag(on = true) {
      val df = sf("events").agg(countDistinct("value").as("d"))
      assert(!hasSketchAgg(df) && hasDistinctAgg(df),
        "double-typed child must not be rewritten")
      val exact = sf("events").select("value").distinct().count()
      assert(df.collect().head.getLong(0) == exact)
    }
  }

  private def withMultiCol[T](body: => T): T = {
    val prev = spark.conf.getOption(ApproxDistinctRewrite.MultiColFlag)
    spark.conf.set(ApproxDistinctRewrite.MultiColFlag, "true")
    try body
    finally prev match {
      case Some(v) =>
        spark.conf.set(ApproxDistinctRewrite.MultiColFlag, v)
      case None =>
        spark.conf.unset(ApproxDistinctRewrite.MultiColFlag)
    }
  }

  test("multi-column count(DISTINCT a, b) needs its own opt-in") {
    def q = sf("events")
      .agg(count_distinct(col("event_type"), col("user_id")).as("d"))
    val exact = q.collect().head.getLong(0)
    withFlag(on = true) {
      // base flag alone: the tuple form keeps its exact plan — its
      // guarantee class (hash composition) differs from the
      // pure-sketch single-column rewrite
      assert(!hasSketchAgg(q) && hasDistinctAgg(q))
      withMultiCol {
        val df = q
        assert(hasSketchAgg(df) && !hasDistinctAgg(df))
        // tuple cardinality at sf0.001 sits in the sketch's exact
        // regime and far below any 64-bit collision likelihood
        assert(df.collect().head.getLong(0) == exact)
      }
    }
  }

  test("multi-column rewrite excludes any-null rows, like Count does") {
    import spark.implicits._
    val df = Seq(
      (Option(1), Option("a")), (Option(1), Option("a")),
      (Option(2), Option("a")), (None: Option[Int], Option("a")),
      (Option(3), Option.empty[String]))
      .toDF("a", "b")
    df.createOrReplaceTempView("nulls_t")
    def q = spark.sql(
      "SELECT count(DISTINCT a, b) AS d FROM nulls_t")
    val exact = q.collect().head.getLong(0)
    assert(exact == 2L, "fixture: (1,a) and (2,a); null rows excluded")
    withFlag(on = true) { withMultiCol {
      assert(hasSketchAgg(q))
      assert(q.collect().head.getLong(0) == exact)
    } }
  }

  test("conf hardening: truthy spellings accepted, malformed values name the conf") {
    // the rule runs on EVERY plan — a bad conf value must be a clear
    // config error, not an opaque toBoolean throw inside optimization
    val prev = spark.conf.getOption(ApproxDistinctRewrite.Flag)
    try {
      spark.conf.set(ApproxDistinctRewrite.Flag, "1")
      assert(hasSketchAgg(sf("events")
        .agg(countDistinct("user_id").as("d"))), "'1' must mean on")
      spark.conf.set(ApproxDistinctRewrite.Flag, "yes")
      val e = intercept[IllegalArgumentException] {
        sf("events").agg(countDistinct("user_id").as("d"))
          .queryExecution.optimizedPlan
      }
      assert(e.getMessage.contains(ApproxDistinctRewrite.Flag))
    } finally prev match {
      case Some(v) => spark.conf.set(ApproxDistinctRewrite.Flag, v)
      case None => spark.conf.unset(ApproxDistinctRewrite.Flag)
    }
  }

  test("conf hardening: malformed multiColumn value names the conf too") {
    withFlag(on = true) {
      val prev = spark.conf.getOption(ApproxDistinctRewrite.MultiColFlag)
      try {
        spark.conf.set(ApproxDistinctRewrite.MultiColFlag, "maybe")
        val e = intercept[IllegalArgumentException] {
          sf("events").agg(countDistinct("user_id").as("d"))
            .queryExecution.optimizedPlan
        }
        assert(e.getMessage.contains(ApproxDistinctRewrite.MultiColFlag))
      } finally prev match {
        case Some(v) =>
          spark.conf.set(ApproxDistinctRewrite.MultiColFlag, v)
        case None =>
          spark.conf.unset(ApproxDistinctRewrite.MultiColFlag)
      }
    }
  }

  test("conf hardening: lgK is bounds-checked with the conf named") {
    withFlag(on = true) {
      val prev = spark.conf.getOption(ApproxDistinctRewrite.LgKConf)
      try {
        spark.conf.set(ApproxDistinctRewrite.LgKConf, "99")
        val e = intercept[IllegalArgumentException] {
          sf("events").agg(countDistinct("user_id").as("d"))
            .queryExecution.optimizedPlan
        }
        assert(e.getMessage.contains(ApproxDistinctRewrite.LgKConf))
      } finally prev match {
        case Some(v) => spark.conf.set(ApproxDistinctRewrite.LgKConf, v)
        case None => spark.conf.unset(ApproxDistinctRewrite.LgKConf)
      }
    }
  }

  test("flag on: FILTER clause rides through the rewrite") {
    val exact = sf("events")
      .agg(count_distinct(when(col("value") > 100, col("user_id")))
        .as("d")).collect().head.getLong(0)
    withFlag(on = true) {
      val df = spark.sql(
        "SELECT count(DISTINCT user_id) FILTER (WHERE value > 100) AS d" +
          " FROM parquet.`/root/testdata/sf0.001/events.parquet`")
      assert(hasSketchAgg(df))
      assert(df.collect().head.getLong(0) == exact)
    }
  }
}
