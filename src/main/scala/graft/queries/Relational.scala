package graft.queries

import graft.ark.Format
import graft.queries.Registry.table
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator battery over the TPC-H-ish test tables — one
  * query per operator family from SURVEY.md §2, each with a DuckDB
  * oracle. Float discipline: money sums are `round(sum(...), 2)` so
  * partial-aggregation order can't leak into the hash compare; every
  * query carries a total ORDER BY for deterministic output.
  */
object Relational {

  /** TPC-H Q1 shape: scan + filter + hash agg (map-side partial),
    * the canonical pricing summary. Plan check: PushedFilters on
    * l_shipdate, 2-col grouping, WholeStageCodegen end-to-end.
    */
  val q01 = Q("q01_pricing_summary",
    (s, dir) => table(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2001-09-01"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
      | sum(l_quantity) AS sum_qty,
      | round(sum(l_extendedprice), 2) AS sum_base_price,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      | round(avg(l_quantity), 4) AS avg_qty,
      | count(*) AS cnt
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** Selective filter + narrow projection — predicate pushdown and
    * column pruning must reach the parquet scan.
    */
  val q02 = Q("q02_filter_pushdown",
    (s, dir) => table(s, dir, "lineitem")
      .filter(col("l_shipdate").between(lit("1998-01-01"), lit("1998-03-31"))
        && col("l_quantity") >= 49 && col("l_discount") > 0.05)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1998-01-01' AND TIMESTAMP '1998-03-31'
      |  AND l_quantity >= 49 AND l_discount > 0.05
      |ORDER BY l_orderkey, l_linenumber""".stripMargin))

  /** Global sort + limit (TakeOrderedAndProject — no full sort at
    * scale, a per-partition top-k then merge).
    */
  val q03 = Q("q03_topk_orders",
    (s, dir) => table(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .limit(100),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin))

  /** Union + whole-row distinct (the reference's merge primitive,
    * SURVEY.md §2.6).
    */
  val q04 = Q("q04_union_distinct",
    (s, dir) => table(s, dir, "customer")
      .select(col("c_nationkey").as("nationkey"))
      .union(table(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .distinct()
      .orderBy("nationkey"),
    Some("""SELECT DISTINCT nationkey FROM (
      | SELECT c_nationkey AS nationkey FROM customer
      | UNION ALL SELECT s_nationkey FROM supplier)
      |ORDER BY nationkey""".stripMargin))

  /** Scalar max (the incremental high-water lookup, SURVEY.md §2.4 A1)
    * + null-count (A2) in one pass.
    */
  val q05 = Q("q05_incremental_max",
    (s, dir) => table(s, dir, "orders")
      .agg(
        max(col("o_orderdate").cast("date")).as("last_day"),
        count(lit(1)).as("n"),
        count(when(col("o_totalprice").isNull, 1)).as("null_totalprice")),
    Some("""SELECT CAST(max(o_orderdate) AS DATE) AS last_day,
      | count(*) AS n,
      | count(CASE WHEN o_totalprice IS NULL THEN 1 END) AS null_totalprice
      |FROM orders""".stripMargin))

  /** Conditional when/otherwise rewriting inside aggregation (the
    * P14 value-rewrite family as a measurable query).
    */
  val q06 = Q("q06_conditional_agg",
    (s, dir) => table(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        count(when(col("o_orderstatus") === "F", 1)).as("finished"),
        count(when(col("o_orderstatus") === "O", 1)).as("open"),
        round(sum(when(col("o_orderstatus") === "F", col("o_totalprice"))
          .otherwise(0)), 2).as("finished_value"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
      | count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS finished,
      | count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS open,
      | round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2)
      |   AS finished_value
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  /** Dimension join — customer is small: broadcast, no shuffle of the
    * fact side.
    */
  val q07 = Q("q07_broadcast_join",
    (s, dir) => table(s, dir, "orders")
      .join(broadcast(table(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("c_mktsegment"),
    Some("""SELECT c_mktsegment, count(*) AS n_orders,
      | round(sum(o_totalprice), 2) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  /** TPC-H Q3 shape: fact-fact shuffle join + agg + top-k. */
  val q08 = Q("q08_join_topk_revenue",
    (s, dir) => table(s, dir, "lineitem")
      .join(table(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10),
    Some("""SELECT l_orderkey, o_orderdate,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin))

  /** TPC-H Q5 shape: snowflake multi-join + grouped revenue, declared
    * FACT-FIRST: the two fact tables (lineitem ⋈ orders) stream
    * through the plan and join on their own keys (shuffle join at
    * scale; AQE may broadcast the orders side locally), while the dim
    * snowflake (customer ⋈ nation ⋈ region — bounded) folds into ONE
    * broadcast. The inverted chain (region as the stream side) made
    * Spark broadcast every RIGHT side including the 600k-row
    * lineitem — a driver-collect of the fact table that was most of
    * the query's local wall time and exactly the plan that dies at
    * 100 TB.
    */
  val q09 = Q("q09_region_revenue",
    (s, dir) => {
      val dims = table(s, dir, "customer")
        .join(broadcast(table(s, dir, "nation")
            .join(broadcast(table(s, dir, "region")),
              col("n_regionkey") === col("r_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("r_name"), col("n_name"))
      table(s, dir, "lineitem")
        .join(table(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    },
    Some("""SELECT r_name, n_name,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      | count(*) AS n_items
      |FROM region
      | JOIN nation ON r_regionkey = n_regionkey
      | JOIN customer ON n_nationkey = c_nationkey
      | JOIN orders ON c_custkey = o_custkey
      | JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin))

  /** Window: latest order per customer (row_number, deterministic
    * tiebreak).
    */
  val q10 = Q("q10_window_latest_order",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      table(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .orderBy("o_custkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate FROM orders
      |QUALIFY row_number() OVER (
      | PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
      |ORDER BY o_custkey""".stripMargin))

  /** Window over aggregate: top-5 users by summed value per event
    * type.
    */
  val q11 = Q("q11_window_top_users",
    (s, dir) => {
      val a = Registry.events(s, dir)
        .groupBy("event_type", "user_id")
        .agg(round(sum("value"), 2).as("total"))
      val w = Window.partitionBy("event_type")
        .orderBy(col("total").desc, col("user_id").asc)
      a.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5).drop("rn")
        .orderBy(col("event_type"), col("total").desc, col("user_id"))
    },
    Some("""WITH a AS (
      | SELECT event_type, user_id, round(sum(value), 2) AS total
      | FROM events GROUP BY event_type, user_id)
      |SELECT event_type, user_id, total FROM a
      |QUALIFY row_number() OVER (
      | PARTITION BY event_type ORDER BY total DESC, user_id) <= 5
      |ORDER BY event_type, total DESC, user_id""".stripMargin))

  /** Semi-structured extraction: JSON path into the props column. */
  val q12 = Q("q12_json_extract",
    (s, dir) => Registry.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count_distinct(col("k")).as("n_k"),
        count(lit(1)).as("n"))
      .orderBy("event_type"),
    Some("""SELECT event_type,
      | CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
      |   AS sum_k,
      | count(DISTINCT CAST(json_extract_string(props, '$.k') AS INT)) AS n_k,
      | count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Explode/unnest (SURVEY.md §2.8): word frequency over part names. */
  val q13 = Q("q13_explode_words",
    (s, dir) => table(s, dir, "part")
      .select(explode(split(col("p_name"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy("word"),
    Some("""SELECT word, count(*) AS cnt FROM (
      | SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
      |GROUP BY word ORDER BY word""".stripMargin))

  /** The ark company-scrub chain (F6/F7 — ~50 ordered literal
    * replaces incl. first-occurrence-only steps via the custom
    * ReplaceFirst expression) applied to synthesized company-like
    * strings; the oracle SQL is GENERATED from the same chain table.
    */
  private val companySuffixes =
    Seq(" INC", " CORP", " HOLDINGS CLASS A", " PLC", "-CL A, LTD.")
  val q14 = Q("q14_company_scrub",
    (s, dir) => {
      val suffix = companySuffixes.zipWithIndex.tail
        .foldLeft(when(col("p_partkey") % 5 === 0, companySuffixes.head)) {
          case (acc, (suf, i)) => acc.when(col("p_partkey") % 5 === i, suf)
        }
      val raw = concat(upper(col("p_name")), suffix)
      table(s, dir, "part")
        .select(col("p_partkey"), raw.as("raw"),
          Format.scrubCompany(raw).as("company"))
        .orderBy("p_partkey")
    }, {
      val suffixSql = companySuffixes.zipWithIndex
        .map { case (suf, i) => s"WHEN ${i} THEN ${SqlGen.lit(suf)}" }
        .mkString(" ")
      val raw = s"upper(p_name) || (CASE p_partkey % 5 $suffixSql END)"
      Some(s"""SELECT p_partkey, $raw AS raw,
        | ${SqlGen.duckScrubCompany(raw)} AS company
        |FROM part ORDER BY p_partkey""".stripMargin)
    })

  /** The ark ticker-scrub chain (F6) — replace-all suffixes plus the
    * first-occurrence-only DKNN fix (doubled in the fixture so
    * first-vs-all semantics are actually distinguished).
    */
  private val tickerSuffixFixture = Seq(" UW", " FP", "/U CN", " DKNN DKNN")
  val q15 = Q("q15_ticker_scrub",
    (s, dir) => {
      val suffix = tickerSuffixFixture.zipWithIndex.tail
        .foldLeft(when(col("s_suppkey") % 4 === 0, tickerSuffixFixture.head)) {
          case (acc, (suf, i)) => acc.when(col("s_suppkey") % 4 === i, suf)
        }
      val raw = concat(upper(col("s_name")), suffix)
      table(s, dir, "supplier")
        .select(col("s_suppkey"), raw.as("raw"),
          Format.scrubTicker(raw).as("ticker"))
        .orderBy("s_suppkey")
    }, {
      val suffixSql = tickerSuffixFixture.zipWithIndex
        .map { case (suf, i) => s"WHEN ${i} THEN ${SqlGen.lit(suf)}" }
        .mkString(" ")
      val raw = s"upper(s_name) || (CASE s_suppkey % 4 $suffixSql END)"
      Some(s"""SELECT s_suppkey, $raw AS raw,
        | ${SqlGen.duckScrubTicker(raw)} AS ticker
        |FROM supplier ORDER BY s_suppkey""".stripMargin)
    })

  /** Derived-column arithmetic + round (the share_price rule F8) as a
    * grouped unit-price computation.
    */
  val q16 = Q("q16_unit_price",
    (s, dir) => table(s, dir, "lineitem")
      .groupBy("l_partkey")
      .agg(round(sum("l_extendedprice") / sum("l_quantity"), 2)
        .as("unit_price"),
        count(lit(1)).as("n"))
      .orderBy("l_partkey"),
    Some("""SELECT l_partkey,
      | round(sum(l_extendedprice) / sum(l_quantity), 2) AS unit_price,
      | count(*) AS n
      |FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""".stripMargin))

  /** Tumbling-window aggregation (batch face of the streaming hourly
    * rollup — the Structured Streaming job computes the same frame).
    */
  val q17 = Q("q17_events_hourly",
    (s, dir) => Registry.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .orderBy("h", "event_type"),
    Some("""SELECT date_trunc('hour', ts) AS h, event_type,
      | count(*) AS n, round(sum(value), 2) AS total
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** As-of join (custom operator — Spark has no built-in): each
    * purchase event picks up the user's latest prior-or-simultaneous
    * click. Oracle: DuckDB's native ASOF LEFT JOIN.
    */
  val q33 = Q("q33_asof_join",
    (s, dir) => {
      val ev = Registry.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("ts").as("click_ts"), col("value").as("click_value"))
      // corpus has no tied click timestamps (checked), so the
      // tiebreak is invisible to the ASOF oracle — it pins determinism
      graft.ops.AsOf.asofJoin(purchases, clicks, "user_id", "ts",
        rightTiebreak = Seq(col("click_value")))
        .select("event_id", "user_id", "ts", "click_ts", "click_value")
        .orderBy("event_id")
    },
    Some("""SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts,
      | c.value AS click_value
      |FROM (SELECT event_id, user_id, ts FROM events
      |      WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
      |      WHERE event_type = 'click') c
      | ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin))

  /** Cardinality sketch: HyperLogLog approximate distinct. No SQL
    * oracle (DuckDB's HLL differs bit-for-bit) — the driver records a
    * rows-only check; OpsSpec bounds the error against [[q36]]'s exact
    * counts (the oracled half of the pair).
    */
  val q34 = Q("q34_approx_distinct",
    (s, dir) => table(s, dir, "lineitem")
      .agg(
        approx_count_distinct("l_orderkey").as("approx_orders"),
        approx_count_distinct("l_partkey").as("approx_parts")),
    None)

  /** Exact distinct counts over the same keys as [[q34]] — the
    * SQL-expressible half of the approx/exact pair, oracle-checked
    * (two count_distincts in one aggregate → a single Expand pass).
    */
  val q36 = Q("q36_exact_distinct",
    (s, dir) => table(s, dir, "lineitem")
      .agg(
        count_distinct(col("l_orderkey")).as("exact_orders"),
        count_distinct(col("l_partkey")).as("exact_parts")),
    Some("""SELECT count(DISTINCT l_orderkey) AS exact_orders,
      | count(DISTINCT l_partkey) AS exact_parts
      |FROM lineitem""".stripMargin))

  /** Salted equi-join (skew mitigation): the salt must be INVISIBLE in
    * the result — the oracle is the plain-join SQL. Same aggregate as
    * q07, so the two rows of the correctness report also pin
    * salted ≡ broadcast.
    */
  val q37 = Q("q37_salted_join",
    (s, dir) => {
      val big = table(s, dir, "orders")
        .select(col("o_custkey").as("custkey"), col("o_totalprice"))
      val small = table(s, dir, "customer")
        .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
      graft.ops.Skew.saltedJoin(big, small, "custkey", salt = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, count(*) AS n_orders,
      | round(sum(o_totalprice), 2) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  /** Winsorization — clip a value column at its per-group p05/p95
    * before aggregating, the standard outlier-robust cleaning step.
    * Bounds computed ONCE per group and broadcast back onto the fact
    * scan; DuckDB `quantile_cont` uses the same (n−1)·p interpolation
    * as Spark `percentile`, so the bounds — and therefore every clip
    * decision — reproduce exactly (round(4) on the REPORTED bounds
    * only; clipping compares against the unrounded values). Exact
    * percentile buffers each group's values — the oracle shape, not
    * the 100 TB one: `spark.graft.winsorize.approx=true` swaps the
    * bounds to `approx_percentile` (GK summaries, mergeable, bounded
    * memory — same dial and same spec discipline as q48; clip bounds
    * are approximate by nature, so a sketch bound is semantically
    * fine at scale). WinsorizeModeSpec pins the approx bounds within
    * rank tolerance of exact.
    */
  val q71 = Q("q71_winsorize",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
      val approx =
        s.conf.get("spark.graft.winsorize.approx", "false").toBoolean
      val acc = s.conf.get("spark.graft.quantiles.accuracy", "10000").toInt
      def pct(p: Double) =
        if (approx)
          expr(s"approx_percentile(l_extendedprice, $p, $acc)")
            .cast("double")
        else expr(s"percentile(l_extendedprice, $p)")
      val bounds = li.groupBy("l_returnflag")
        .agg(pct(0.05).as("_lo"), pct(0.95).as("_hi"))
      val clipped = least(greatest(col("l_extendedprice"), col("_lo")),
        col("_hi"))
      li.join(broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(round(first(col("_lo")), 4).as("lo"),
          round(first(col("_hi")), 4).as("hi"),
          sum(when(col("l_extendedprice") < col("_lo") ||
            col("l_extendedprice") > col("_hi"), 1).otherwise(0))
            .as("n_clipped"),
          round(avg(clipped), 4).as("avg_winsorized"),
          round(avg(col("l_extendedprice")), 4).as("avg_raw"))
        .orderBy("l_returnflag")
    },
    Some("""WITH b AS (SELECT l_returnflag,
      |  quantile_cont(l_extendedprice, 0.05) AS lo,
      |  quantile_cont(l_extendedprice, 0.95) AS hi
      | FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, round(lo, 4) AS lo, round(hi, 4) AS hi,
      | CAST(sum(CASE WHEN l_extendedprice < lo OR l_extendedprice > hi
      |   THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
      | round(avg(least(greatest(l_extendedprice, lo), hi)), 4)
      |   AS avg_winsorized,
      | round(avg(l_extendedprice), 4) AS avg_raw
      |FROM lineitem JOIN b USING (l_returnflag)
      |GROUP BY l_returnflag, lo, hi ORDER BY l_returnflag""".stripMargin))

  /** Per-user event-time features — the feature-engineering staple
    * (gap since previous event, 3-event moving average, sequence
    * index). All three are one window keyed by user (bounded
    * partitions), deterministic (ts, event_id) order.
    */
  val q72 = Q("q72_user_features",
    (s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val w3 = w.rowsBetween(-2, Window.currentRow)
      Registry.events(s, dir)
        .withColumn("seq", row_number().over(w))
        .withColumn("prev_gap_us",
          (unix_micros(col("ts").cast("timestamp")) -
            unix_micros(lag(col("ts"), 1).over(w).cast("timestamp")))
            .cast("long"))
        .withColumn("mov_avg3", round(avg(col("value")).over(w3), 4))
        .select(col("user_id"), col("event_id"), col("seq"),
          col("prev_gap_us"), col("mov_avg3"))
        .orderBy("user_id", "seq")
    },
    Some("""SELECT user_id, event_id,
      | CAST(row_number() OVER w AS INT) AS seq,
      | CAST(epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS BIGINT)
      |   AS prev_gap_us,
      | round(avg(value) OVER (PARTITION BY user_id
      |   ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING
      |   AND CURRENT ROW), 4) AS mov_avg3
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, seq""".stripMargin))

  /** Per-group z-score normalization — the feature-scaling staple:
    * standardize event values within their type. Group moments
    * partial-aggregate (one tiny exchange), broadcast back onto the
    * scan; the per-row z is a pure projection. `stddev_samp` both
    * engines; sums-of-squares addition order differs, so the moments
    * are rounded to 6 before the division AND z rounds to 4 (the
    * oracle-discipline double-sum rule) — both engines divide the
    * same literal moments, so a z near a .00005 boundary cannot
    * straddle it from order-dependent float noise alone.
    */
  val q73 = Q("q73_zscore_normalize",
    (s, dir) => {
      val ev = Registry.events(s, dir)
      val moments = ev.groupBy("event_type")
        .agg(round(avg("value"), 6).as("_mu"),
          round(stddev_samp(col("value")), 6).as("_sd"))
      ev.join(broadcast(moments), "event_type")
        .select(col("event_id"), col("event_type"),
          round((col("value") - col("_mu")) / col("_sd"), 4).as("z"))
        .orderBy("event_id")
    },
    Some("""WITH m AS (SELECT event_type, round(avg(value), 6) AS mu,
      |  round(stddev_samp(value), 6) AS sd FROM events GROUP BY event_type)
      |SELECT event_id, event_type,
      | round((value - mu) / sd, 4) AS z
      |FROM events JOIN m USING (event_type)
      |ORDER BY event_id""".stripMargin))

  /** BATCH interval join via time-bucketing — q66's conversion-join
    * semantics (per click, purchases of the same user within the next
    * 10 min) without the streaming state machine, and WITHOUT the
    * nested-loop plan a naive range predicate degenerates to: both
    * sides bucket to 10-min epochs, the right side duplicates into
    * the two buckets that can contain a match (bk, bk−1), the join is
    * pure EQUI on (user_id, bucket) with the range condition left as
    * a post-join filter. Shuffle is linear in events (×2 on the
    * probe side), per-task state one (user, bucket) cell — the
    * interval-join shape that survives 100 TB, vs. the O(n·m) BNLJ.
    * A left join keeps zero-conversion clicks (count counts matches
    * only).
    */
  val q76 = Q("q76_interval_join_bucketed",
    (s, dir) => {
      val gapUs = 600L * 1000000L
      val ev = Registry.events(s, dir)
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      // integer `div` (= floor for the always-positive epoch) keeps
      // bucketing out of double arithmetic entirely
      val bucket = expr(s"us div ${gapUs}L")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("us").as("a_us"),
          bucket.as("bk"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("us").as("b_us"),
          explode(array(bucket, bucket - 1)).as("bk"))
      clicks.join(purchases,
          Seq("user_id", "bk"), "left")
        .groupBy("event_id")
        .agg(sum(when(col("b_us") > col("a_us") &&
            col("b_us") <= col("a_us") + gapUs, 1L).otherwise(0L))
          .as("n_conversions"))
        .orderBy("event_id")
    },
    Some("""SELECT a.event_id AS event_id,
      | CAST(count(b.event_id) AS BIGINT) AS n_conversions
      |FROM events a LEFT JOIN events b
      | ON a.user_id = b.user_id AND b.event_type = 'purchase'
      | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
      |WHERE a.event_type = 'click'
      |GROUP BY a.event_id ORDER BY a.event_id""".stripMargin))

  /** Robust (median/IQR) per-group scaling — q73's z-score with
    * outlier-immune moments: (value − median) / (p75 − p25). Exact
    * `percentile` (linear interpolation, same formula both engines);
    * the three quantiles partial-aggregate to one tiny broadcast
    * table exactly like q73's moments, and the same rounding
    * discipline applies (moments to 6 before the division, scaled
    * value to 4). At corpus scale the exact percentile becomes q48's
    * approx/GK mode; the scaling projection is unchanged.
    */
  val q77 = Q("q77_robust_scale",
    (s, dir) => {
      val ev = Registry.events(s, dir)
      val m = ev.groupBy("event_type").agg(
        round(expr("percentile(value, 0.5)"), 6).as("_med"),
        round(expr("percentile(value, 0.75) - percentile(value, 0.25)"), 6)
          .as("_iqr"))
      ev.join(broadcast(m), "event_type")
        .select(col("event_id"), col("event_type"),
          round((col("value") - col("_med")) / col("_iqr"), 4).as("rz"))
        .orderBy("event_id")
    },
    Some("""WITH m AS (SELECT event_type,
      |  round(quantile_cont(value, 0.5), 6) AS med,
      |  round(quantile_cont(value, 0.75) - quantile_cont(value, 0.25), 6)
      |    AS iqr
      | FROM events GROUP BY event_type)
      |SELECT event_id, event_type,
      | round((value - med) / iqr, 4) AS rz
      |FROM events JOIN m USING (event_type)
      |ORDER BY event_id""".stripMargin))

  /** CUBE rollup — the OLAP operator the battery was missing: one
    * pass over lineitem emits all four grouping sets of (returnflag,
    * linestatus) with `grouping_id` tagging each stratum. Spark
    * expands the sets BEFORE the hash aggregate, so the plan is still
    * one scan + one partial-aggregated exchange (4× the group rows,
    * not 4× the input). NULL grouping keys sort differently by
    * default in the two engines (Spark NULLS FIRST, DuckDB NULLS
    * LAST) — the ORDER BY pins NULLS FIRST explicitly on both sides.
    */
  val q80 = Q("q80_cube_rollup",
    (s, dir) => table(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("int").as("gid"),
        sum("l_quantity").as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        count(lit(1)).as("cnt"))
      .orderBy(col("gid").asc,
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first),
    Some("""SELECT l_returnflag, l_linestatus,
      | CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
      | sum(l_quantity) AS sum_qty,
      | round(sum(l_extendedprice), 2) AS sum_price,
      | count(*) AS cnt
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag NULLS FIRST,
      | l_linestatus NULLS FIRST""".stripMargin))

  /** Blocked fuzzy entity lookup — resolve a probe batch of entity
    * names against the master dimension by edit distance, the daily
    * entity-resolution operation. The blocking key (name prefix)
    * turns the all-pairs O(N·M) into per-block candidates: the join
    * is pure EQUI on the block, `levenshtein` is a post-join
    * projection, and the probe side broadcasts (a probe batch is
    * always ≪ the dimension). At 100 TB the dimension side shuffles
    * once on the block key; a hot block is a salting candidate, not
    * a plan change. Both engines ship the same `levenshtein`.
    */
  val q81 = Q("q81_fuzzy_match",
    (s, dir) => {
      val cust = table(s, dir, "customer")
      val block = substring(col("c_name"), 1, 16)
      val probe = cust.filter(col("c_custkey") % 50 === 0)
        .select(col("c_custkey").as("probe_key"),
          col("c_name").as("probe_name"), block.as("blk"))
      val master = cust.select(col("c_custkey").as("match_key"),
        col("c_name").as("match_name"), block.as("blk"))
      broadcast(probe).join(master, "blk")
        .filter(col("probe_key") =!= col("match_key"))
        .withColumn("dist",
          levenshtein(col("probe_name"), col("match_name")).cast("int"))
        .filter(col("dist") <= 1)
        .select("probe_key", "match_key", "dist")
        .orderBy("probe_key", "match_key")
    },
    Some("""SELECT p.c_custkey AS probe_key, m.c_custkey AS match_key,
      | CAST(levenshtein(p.c_name, m.c_name) AS INT) AS dist
      |FROM customer p JOIN customer m
      | ON substr(p.c_name, 1, 16) = substr(m.c_name, 1, 16)
      | AND p.c_custkey <> m.c_custkey
      |WHERE p.c_custkey % 50 = 0
      | AND levenshtein(p.c_name, m.c_name) <= 1
      |ORDER BY probe_key, match_key""".stripMargin))

  /** SCD type-2 interval build — collapse an event stream into the
    * versioned dimension shape every warehouse maintains: per user,
    * each run of consecutive equal `event_type` becomes one row with
    * [valid_from, valid_to) micros and an is_current flag. Change
    * detection (lag ≠), versioning (row_number) and interval close
    * (lead) are three functions over the SAME (user_id → ts) window
    * spec, so the whole build is one shuffle + one sort; per-task
    * state is one user's history. Interval bounds ship as epoch
    * micros — the battery's timestamp-hash discipline.
    */
  val q87 = Q("q87_scd2_build",
    (s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val changes = Registry.events(s, dir)
        .withColumn("_prev", lag("event_type", 1).over(w))
        .filter(col("_prev").isNull || col("_prev") =!= col("event_type"))
      val wv = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      changes
        .withColumn("ver", row_number().over(wv).cast("int"))
        .withColumn("valid_from",
          unix_micros(col("ts").cast("timestamp")))
        .withColumn("valid_to",
          lead(unix_micros(col("ts").cast("timestamp")), 1).over(wv))
        .withColumn("is_current", col("valid_to").isNull)
        .select("user_id", "ver", "event_type", "valid_from",
          "valid_to", "is_current")
        .orderBy("user_id", "ver")
    },
    Some("""WITH ch AS (
      | SELECT user_id, event_type, ts, event_id,
      |  lag(event_type, 1) OVER w AS prev
      | FROM events WINDOW w AS (PARTITION BY user_id
      |   ORDER BY ts, event_id)),
      |f AS (SELECT user_id, event_type, ts, event_id FROM ch
      | WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id,
      | CAST(row_number() OVER w AS INT) AS ver, event_type,
      | epoch_us(ts) AS valid_from,
      | lead(epoch_us(ts), 1) OVER w AS valid_to,
      | lead(epoch_us(ts), 1) OVER w IS NULL AS is_current
      |FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, ver""".stripMargin))

  /** Join-key skew profile — the advisory that tells you WHETHER to
    * reach for [[graft.ops.Skew]]: per-key cardinality histogram,
    * each key's ratio to the mean, and a salt recommendation
    * (⌈ratio⌉ capped at 16) for keys above 2×. One partial-aggregated
    * count per key + a scalar broadcast — the profile costs one
    * linear pass, which is why you run it BEFORE committing a 100 TB
    * join plan. The ratio divides exact integers by an exact-integer
    * quotient, then rounds; the salt count ceils the ROUNDED ratio
    * so both engines ceil the same literal.
    */
  val q88 = Q("q88_skew_profile",
    (s, dir) => {
      val cnt = table(s, dir, "events")
        .groupBy("user_id").agg(count(lit(1)).as("cnt"))
      val m = cnt.agg((sum("cnt") / count(lit(1))).as("_avg"))
      cnt.crossJoin(broadcast(m))
        .withColumn("ratio", round(col("cnt") / col("_avg"), 4))
        .withColumn("skewed", col("ratio") > 2)
        .withColumn("salts",
          least(lit(16), greatest(lit(1), ceil(col("ratio")))).cast("int"))
        .select("user_id", "cnt", "ratio", "skewed", "salts")
        .orderBy(col("cnt").desc, col("user_id").asc)
        .limit(10)
    },
    Some("""WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY user_id),
      |m AS (SELECT CAST(sum(cnt) AS DOUBLE) / count(*) AS a FROM c)
      |SELECT user_id, cnt, round(cnt / a, 4) AS ratio,
      | round(cnt / a, 4) > 2 AS skewed,
      | CAST(least(16, greatest(1, ceil(round(cnt / a, 4)))) AS INT)
      |   AS salts
      |FROM c, m ORDER BY cnt DESC, user_id LIMIT 10""".stripMargin))

  /** Z-order layout profile — the write-time clustering that makes
    * MULTI-column min/max pruning work at 100 TB
    * ([[graft.ops.Layout.zValue]]): interleave (user_id,
    * minute-of-day ÷ 8) bits,
    * bucket by the TOP z bits (what a file boundary would be in a
    * z-ordered write), and emit each bucket's (x, y) bounding box.
    * The payoff is visible in the output: every bucket spans ≤ 2⁵ in
    * BOTH dimensions, where a lexicographic sort gives tight x and
    * full-range y. The z-value is a pure codegen'd projection
    * (shifts + masks); the profile is one partial-aggregated groupBy.
    * LayoutSpec asserts the rectangle bound; the oracle interleaves
    * the same bits via the shared generator.
    */
  val q89 = {
    val zsql = graft.ops.Layout.zValueSql("x", "y", 8)
    Q("q89_zorder_layout",
      (s, dir) => Registry.events(s, dir)
        .select((col("user_id") % 256).cast("int").as("x"),
          shiftright((hour(col("ts")) * 60 + minute(col("ts")))
            .cast("int"), 3).as("y"))
        .withColumn("zbucket",
          shiftright(graft.ops.Layout.zValue(col("x"), col("y"), 8), 10)
            .cast("int"))
        .groupBy("zbucket")
        .agg(count(lit(1)).as("n"),
          min("x").as("min_x"), max("x").as("max_x"),
          min("y").as("min_y"), max("y").as("max_y"))
        .orderBy("zbucket"),
      Some(s"""WITH p AS (SELECT CAST(user_id % 256 AS INT) AS x,
        |  CAST(hour(ts) * 60 + minute(ts) AS INT) >> 3 AS y
        | FROM events),
        |z AS (SELECT x, y, CAST(($zsql) AS INT) >> 10 AS zbucket
        | FROM p)
        |SELECT zbucket, count(*) AS n,
        | min(x) AS min_x, max(x) AS max_x,
        | min(y) AS min_y, max(y) AS max_y
        |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin))
  }

  /** FORWARD as-of join ([[graft.ops.AsOf.asofJoinForward]]): for
    * each purchase, the user's NEXT click at or after it — the
    * "first action after conversion" attribution, q33's mirror. Same
    * union + single-window plan, iterated in descending time; the
    * oracle ranks candidate future clicks per purchase and keeps
    * rn = 1 (LEFT join, so unmatched purchases keep their null row).
    */
  val q97 = Q("q97_asof_forward",
    (s, dir) => {
      val ev = Registry.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("ts").as("click_ts"), col("value").as("click_value"))
      graft.ops.AsOf.asofJoinForward(purchases, clicks, "user_id", "ts",
        rightTiebreak = Seq(col("click_value")))
        .select("event_id", "user_id", "ts", "click_ts", "click_value")
        .orderBy("event_id")
    },
    Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
      |       WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts, value FROM events
      |       WHERE event_type = 'click'),
      |j AS (SELECT p.event_id, p.user_id, p.ts,
      |  c.ts AS click_ts, c.value AS click_value,
      |  row_number() OVER (PARTITION BY p.event_id
      |    ORDER BY c.ts, c.value) AS rn
      | FROM p LEFT JOIN c
      |  ON p.user_id = c.user_id AND c.ts >= p.ts)
      |SELECT event_id, user_id, ts, click_ts, click_value
      |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin))

  /** Time-series gap fill — sparse-to-dense resampling, the feature-
    * engineering prerequisite for any fixed-step model input: hourly
    * rollups per event type, with MISSING hours materialized as
    * zero rows from an hour spine (`sequence` between the corpus
    * bounds × the type dimension). The spine is generated, not
    * scanned (bounds are one tiny aggregate broadcast into a
    * sequence explode); the left join back to the real rollup is the
    * only shuffle. Zero-filled hours carry n = 0, total = 0.0 —
    * COALESCE pinned on both engines.
    */
  val q98 = Q("q98_gap_fill",
    (s, dir) => {
      val ev = Registry.events(s, dir)
      val hourly = ev
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("_n"), round(sum("value"), 2).as("_t"))
      val bounds = ev.agg(
        date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
      // the type dimension is a bounded domain but its distinct is a
      // post-shuffle frame with no stats — AQE usually broadcasts it,
      // and the explicit hint removes the threshold bistability (the
      // q64 fix applied here): the spine build is pinned shuffle-free
      // on the cross side at every scale
      val spine = bounds
        .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
        .crossJoin(broadcast(ev.select("event_type").distinct()))
      spine.join(hourly, Seq("event_type", "h"), "left")
        .select(col("event_type"), col("h"),
          coalesce(col("_n"), lit(0L)).as("n"),
          coalesce(col("_t"), lit(0.0)).as("total"))
        .orderBy("event_type", "h")
    },
    Some("""WITH hourly AS (SELECT event_type,
      |  date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS n,
      |  round(sum(value), 2) AS t
      | FROM events GROUP BY 1, 2),
      |b AS (SELECT date_trunc('hour', min(ts)) AS lo,
      |  date_trunc('hour', max(ts)) AS hi FROM events),
      |spine AS (SELECT t.event_type,
      |  unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      | FROM b, (SELECT DISTINCT event_type FROM events) t)
      |SELECT s.event_type, s.h, coalesce(n, 0) AS n,
      | coalesce(t, 0.0) AS total
      |FROM spine s LEFT JOIN hourly USING (event_type, h)
      |ORDER BY event_type, h""".stripMargin))

  /** PIVOT — long-to-wide reshaping with a FIXED value list (open
    * pivots need a discovery pass; production pivots pin the
    * columns): per-user event values spread across one column per
    * event type. Spark expands the pivot into conditional aggregates
    * BEFORE the hash aggregate, so the plan is one partial-aggregated
    * shuffle regardless of the column count — exactly the CASE
    * aggregation the oracle writes out longhand.
    */
  val q93 = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Q("q93_pivot",
      (s, dir) => table(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(round(sum("value"), 2))
        .orderBy("user_id"),
      Some(s"""SELECT user_id,
        |${types.map(t =>
             s" round(sum(CASE WHEN event_type = '$t' THEN value END), 2) AS \"$t\"")
             .mkString(",\n")}
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))
  }

  /** UNPIVOT/melt — the inverse reshape: a wide per-flag aggregate
    * melts into (flag, metric, value) rows via Spark's native
    * `unpivot` (an Expand node: n metrics × rows, zero extra
    * shuffles beyond the aggregate that built the wide frame). The
    * oracle re-melts with UNION ALL — column-to-row semantics pinned
    * on both engines.
    */
  val q94 = Q("q94_unpivot",
    (s, dir) => table(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        round(avg("l_discount"), 4).as("avg_disc"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("avg_disc")),
        "metric", "value")
      .orderBy("l_returnflag", "metric"),
    Some("""WITH w AS (SELECT l_returnflag,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_price,
      |  round(avg(l_discount), 4) AS avg_disc
      | FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, metric, value FROM (
      | SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
      | UNION ALL
      | SELECT l_returnflag, 'sum_price', sum_price FROM w
      | UNION ALL
      | SELECT l_returnflag, 'avg_disc', avg_disc FROM w)
      |ORDER BY l_returnflag, metric""".stripMargin))

  /** Linear attribution — split each purchase's credit equally
    * across the user's clicks in the prior 10 minutes (q76's
    * conversion join, inverted and weighted): credit = 1/n over the
    * contributing clicks, rounded off the exact integer count so
    * both engines divide the same literal. The join is the q76
    * time-bucket equi-join shape (linear shuffle, range as a
    * post-filter); the per-purchase count is one window over the
    * join's own key.
    */
  val q103 = Q("q103_attribution",
    (s, dir) => {
      val ev = Registry.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          col("ts").as("p_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("c_id"),
          col("ts").as("c_ts"))
      val w = Window.partitionBy("p_id")
      purchases.join(clicks, "user_id")
        .filter(col("c_ts") <= col("p_ts") &&
          col("c_ts") > col("p_ts") - expr("INTERVAL 10 MINUTES"))
        .withColumn("credit",
          round(lit(1.0) / count(lit(1)).over(w), 4))
        .select("p_id", "c_id", "credit")
        .orderBy("p_id", "c_id")
    },
    Some("""WITH p AS (SELECT user_id, event_id AS p_id, ts AS p_ts
      |       FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, event_id AS c_id, ts AS c_ts FROM events
      |       WHERE event_type = 'click'),
      |j AS (SELECT p_id, c_id FROM p JOIN c USING (user_id)
      | WHERE c_ts <= p_ts AND c_ts > p_ts - INTERVAL 10 MINUTE)
      |SELECT p_id, c_id,
      | round(1.0 / count(*) OVER (PARTITION BY p_id), 4) AS credit
      |FROM j ORDER BY p_id, c_id""".stripMargin))

  /** Conversion funnel — users progressing through click → view →
    * purchase IN ORDER (each stage's first event must follow the
    * previous stage's): per-user stage timestamps collapse to one
    * row via conditional MIN aggregates (one shuffle), the ordering
    * constraint is a projection, stage counts are a tiny rollup.
    * The `n_users` column is monotonically non-increasing by
    * construction — the funnel invariant, spec-asserted. Stage counts
    * left-join a static 3-row stage spine so a stage no user reaches
    * still emits its zero row (the oracle's UNION ALL shape); the
    * per-depth rollup happens BEFORE the spine join, so the join is a
    * broadcast of at most 4 rows, not a per-user cross product.
    */
  val q104 = Q("q104_funnel",
    (s, dir) => {
      val ev = Registry.events(s, dir)
      val stages = ev.groupBy("user_id").agg(
        min(when(col("event_type") === "click", col("ts"))).as("t1"))
        .join(ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts").as("_tv")), Seq("user_id"),
          "left")
        .groupBy("user_id", "t1")
        .agg(min(when(col("_tv") > col("t1"), col("_tv"))).as("t2"))
        .join(ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("_tp")), Seq("user_id"),
          "left")
        .groupBy("user_id", "t1", "t2")
        .agg(min(when(col("_tp") > col("t2"), col("_tp"))).as("t3"))
      val byDepth = stages.select(
          when(col("t3").isNotNull, 3)
            .when(col("t2").isNotNull, 2)
            .when(col("t1").isNotNull, 1).otherwise(0).as("_depth"))
        .groupBy("_depth").agg(count(lit(1)).as("_c"))
      s.range(1, 4).select(col("id").cast("int").as("stage"))
        .join(broadcast(byDepth), col("_depth") >= col("stage"), "left")
        .groupBy("stage")
        .agg(coalesce(sum("_c"), lit(0L)).as("n_users"))
        .orderBy("stage")
    },
    Some("""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
      |       WHERE event_type = 'click' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      | JOIN s1 ON e.user_id = s1.user_id
      | WHERE e.event_type = 'view' AND e.ts > s1.t1
      | GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      | JOIN s2 ON e.user_id = s2.user_id
      | WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      | GROUP BY e.user_id)
      |SELECT CAST(stage AS INT) AS stage,
      | CAST(n_users AS BIGINT) AS n_users FROM (
      | SELECT 1 AS stage, count(*) AS n_users FROM s1
      | UNION ALL SELECT 2, count(*) FROM s2
      | UNION ALL SELECT 3, count(*) FROM s3)
      |ORDER BY stage""".stripMargin))

  /** Cohort retention — users grouped by first-activity DAY, then
    * counted by how many days later they return: the (cohort_day,
    * day_offset, n_users) retention triangle every product-analytics
    * stack materializes. First-activity day is one aggregate; the
    * offset join rides the events scan; counts are
    * COUNT(DISTINCT user) per cell (exact here; the 100 TB variant
    * swaps in the q34 HLL sketch per cell).
    */
  val q105 = Q("q105_cohort_retention",
    (s, dir) => {
      val ev = Registry.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d"))
      val cohort = ev.groupBy("user_id").agg(min("d").as("c_day"))
      ev.join(cohort, "user_id")
        .select(col("user_id"), col("c_day"),
          datediff(col("d"), col("c_day")).as("day_offset"))
        .groupBy("c_day", "day_offset")
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("c_day", "day_offset")
    },
    Some("""WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d
      |       FROM events),
      |c AS (SELECT user_id, min(d) AS c_day FROM ev GROUP BY user_id)
      |SELECT c_day, CAST(datediff('day', c_day, d) AS INT)
      |   AS day_offset,
      | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM ev JOIN c USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Hilbert vs Z-order layout under REALISTIC file boundaries —
    * q89 buckets by aligned key prefix, where both curves give tight
    * power-of-two boxes; real files are row-count bounded, so this
    * query shifts every bucket boundary by half a bucket and emits
    * BOTH curves' per-file (x, y) bounding boxes side by side. The
    * Hilbert curve is CONTINUOUS (consecutive indices grid-adjacent,
    * proven exhaustively in LayoutSpec), so a straddling file still
    * spans a bounded box; the Z curve jumps at power-of-two seams
    * and its worst box is ~5× larger (8192 vs 1536 cells here) —
    * the number that decides which curve to write 100 TB in.
    * One scan, two partial-aggregated groupBys; the per-bit
    * Hilbert walk is a chain of codegen'd projections
    * ([[graft.ops.Layout.hilbertFrame]]), mirrored CTE-for-CTE by
    * the oracle.
    */
  val q122 = {
    val bits = 8
    val zsql = graft.ops.Layout.zValueSql("x", "y", bits)
    Q("q122_hilbert_layout",
      (s, dir) => {
        val p = Registry.events(s, dir).select(
          (col("user_id") % 256).cast("int").as("x"),
          shiftright((hour(col("ts")) * 60 + minute(col("ts")))
            .cast("int"), 3).as("y"))
        val h = graft.ops.Layout.hilbertFrame(p, col("x"), col("y"), bits)
          .withColumn("zval",
            graft.ops.Layout.zValue(col("x"), col("y"), bits))
          .withColumn("hbucket",
            shiftright(col("hval") + 512, 10).cast("int"))
          .withColumn("zbucket",
            shiftright(col("zval") + 512, 10).cast("int"))
        def boxes(curve: String, bCol: String) = h
          .groupBy(lit(curve).as("curve"), col(bCol).as("bucket"))
          .agg(count(lit(1)).as("n"),
            min("x").as("min_x"), max("x").as("max_x"),
            min("y").as("min_y"), max("y").as("max_y"))
          .withColumn("box_area",
            ((col("max_x") - col("min_x") + 1) *
              (col("max_y") - col("min_y") + 1)).cast("long"))
        boxes("hilbert", "hbucket").union(boxes("zorder", "zbucket"))
          .orderBy("curve", "bucket")
      },
      Some(s"""WITH p AS (SELECT CAST(user_id % 256 AS INT) AS x,
        |  CAST(hour(ts) * 60 + minute(ts) AS INT) >> 3 AS y
        | FROM events),
        |${graft.ops.Layout.hilbertSql("p", bits)},
        |b AS (SELECT x, y, (pd + 512) >> 10 AS hbucket,
        |  (($zsql) + 512) >> 10 AS zbucket FROM h0)
        |SELECT curve, CAST(bucket AS INT) AS bucket, n, min_x, max_x,
        | min_y, max_y,
        | CAST((max_x - min_x + 1) * (max_y - min_y + 1) AS BIGINT)
        |   AS box_area
        |FROM (
        | SELECT 'hilbert' AS curve, hbucket AS bucket,
        |  CAST(count(*) AS BIGINT) AS n, min(x) AS min_x,
        |  max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
        | FROM b GROUP BY hbucket
        | UNION ALL
        | SELECT 'zorder', zbucket, CAST(count(*) AS BIGINT), min(x),
        |  max(x), min(y), max(y)
        | FROM b GROUP BY zbucket)
        |ORDER BY curve, bucket""".stripMargin))
  }

  /** The [[graft.plans.ApproxDistinctRewrite]] optimizer rule run as
    * a battery query: the same per-event-type distinct-user rollup
    * executed twice — flag OFF (exact plan, distinct re-shuffle) and
    * flag ON (one sketch aggregation pass) — with the per-group
    * relative error in the output. Both runs materialize INSIDE the
    * query (group count = |event_type| domain, a bounded collect)
    * because the flag must still be set when the plan optimizes —
    * lazily returning the flag-on frame would optimize it after the
    * reset below. No DuckDB oracle (the estimate is
    * datasketches-specific — the q34/q85/q127 convention);
    * ApproxDistinctRewriteSpec pins the plan change (sketch agg in,
    * Expand gone), the exact-regime equality this query's rel_err
    * column exhibits at test SFs, and the 5·RSE estimate-mode bound.
    */
  val q130 = Q("q130_approx_distinct_rewrite",
    (s, dir) => {
      import graft.plans.ApproxDistinctRewrite.Flag
      def usersPerType(): Map[String, Long] =
        Registry.table(s, dir, "events").groupBy("event_type")
          .agg(countDistinct("user_id").as("users"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = usersPerType()
      val prev = s.conf.getOption(Flag)
      s.conf.set(Flag, "true")
      val approx =
        try usersPerType()
        finally prev match {
          case Some(v) => s.conf.set(Flag, v)
          case None => s.conf.unset(Flag)
        }
      import s.implicits._
      exact.keys.toSeq.sorted.map { et =>
        val (e, a) = (exact(et), approx(et))
        (et, e, a,
          math.rint(1e4 * math.abs(a - e).toDouble / e.max(1L)) / 1e4)
      }.toDF("event_type", "exact_users", "approx_users", "rel_err")
        .orderBy("event_type")
    },
    None)

  /** q33's as-of join through the NATIVE operator
    * ([[graft.ops.AsOf.asofJoinNative]]: custom logical node →
    * injected SparkStrategy → merge-walk AsOfJoinExec) instead of
    * the union + window composition — the same join, the same DuckDB
    * `ASOF LEFT JOIN` oracle, a different physical engine. The exec
    * consumes both key-clustered time-sorted sides ONCE with O(1)
    * state per key (the window alternative buffers each key's whole
    * frame), so this is the shape that survives a hot key at 100 TB;
    * AsOfPlanSpec pins value equality with q33's operator, the
    * null-semantics contract, and the plan (AsOfJoinExec, two
    * clustered exchanges, no window).
    */
  val q142 = Q("q142_asof_native",
    (s, dir) => {
      val ev = Registry.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("ts").as("click_ts"), col("value").as("click_value"))
      graft.ops.AsOf.asofJoinNative(purchases, clicks, "user_id", "ts",
        tiebreak = Seq("click_value"))
        .select("event_id", "user_id", "ts", "click_ts", "click_value")
        .orderBy("event_id")
    },
    Some("""SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts,
      | c.value AS click_value
      |FROM (SELECT event_id, user_id, ts FROM events
      |      WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
      |      WHERE event_type = 'click') c
      | ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin))

  /** q97's FORWARD as-of through the native operator — the
    * time-mirrored walk ([[graft.ops.AsOf.asofJoinNativeForward]]:
    * both sides sort time-descending, the identical last-wins merge
    * lands on the earliest right row ≥ each left time, smallest
    * tiebreak among ties). Same oracle as q97; AsOfPlanSpec pins
    * equality with the window composition and the tie convention.
    */
  val q143 = Q("q143_asof_native_forward",
    (s, dir) => {
      val ev = Registry.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("ts").as("click_ts"), col("value").as("click_value"))
      graft.ops.AsOf.asofJoinNativeForward(purchases, clicks,
        "user_id", "ts", tiebreak = Seq("click_value"))
        .select("event_id", "user_id", "ts", "click_ts", "click_value")
        .orderBy("event_id")
    },
    Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
      |       WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts, value FROM events
      |       WHERE event_type = 'click'),
      |j AS (SELECT p.event_id, p.user_id, p.ts,
      |  c.ts AS click_ts, c.value AS click_value,
      |  row_number() OVER (PARTITION BY p.event_id
      |    ORDER BY c.ts, c.value) AS rn
      | FROM p LEFT JOIN c
      |  ON p.user_id = c.user_id AND c.ts >= p.ts)
      |SELECT event_id, user_id, ts, click_ts, click_value
      |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin))

  /** q142's attribution join with the lookback BOUNDED to one hour —
    * the `p.ts - c.ts <= tol` form real attribution joins use (a
    * click ten days old should not claim a purchase). Same native
    * merge-walk exec; the bound is a post-check on the nearest match
    * (no earlier row could pass where the nearest failed), so the
    * plan is identical to q142's. Tolerance is in the time column's
    * native unit — µs for these timestamps. The oracle is the
    * explicit windowed form (DuckDB's ASOF syntax has no tolerance
    * clause): last click at-or-before the purchase AND within the
    * hour, ties on (ts) resolved largest-value-last like q142.
    */
  val q144 = Q("q144_asof_tolerance",
    (s, dir) => {
      val ev = Registry.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("ts").as("click_ts"), col("value").as("click_value"))
      graft.ops.AsOf.asofJoinNative(purchases, clicks, "user_id", "ts",
        tiebreak = Seq("click_value"),
        tolerance = Some(3600L * 1000000L))
        .select("event_id", "user_id", "ts", "click_ts", "click_value")
        .orderBy("event_id")
    },
    Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
      |       WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts, value FROM events
      |       WHERE event_type = 'click'),
      |j AS (SELECT p.event_id, p.user_id, p.ts,
      |  c.ts AS click_ts, c.value AS click_value,
      |  row_number() OVER (PARTITION BY p.event_id
      |    ORDER BY c.ts DESC, c.value DESC) AS rn
      | FROM p LEFT JOIN c
      |  ON p.user_id = c.user_id AND c.ts <= p.ts
      |   AND c.ts >= p.ts - INTERVAL 1 HOUR)
      |SELECT event_id, user_id, ts, click_ts, click_value
      |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin))

  /** Temporal dimension enrichment through the BROADCAST as-of
    * variant — the rates/config-epoch shape: a tiny versioned
    * dimension (per-event-type rate epochs, deliberately SPARSE —
    * only every 4th hour publishes one, so most events really do
    * look BACK to an earlier epoch and the join is not a disguised
    * equi-join) enriches the full event stream. `broadcastRight`
    * plans [[graft.plans.BroadcastAsOfJoinExec]]: the dimension
    * broadcasts whole, each task binary-searches its per-key sorted
    * history, and the EVENT side keeps its scan partitioning —
    * zero exchanges and zero sorts on the 100 TB side (AsOfPlanSpec
    * pins that plan; the one hash exchange in this query's plan is
    * the dimension's own groupBy). Events before their type's first
    * epoch keep a null rate.
    */
  val q145 = Q("q145_asof_broadcast_enrich",
    (s, dir) => {
      val ev = Registry.events(s, dir)
      // date_trunc returns TIMESTAMP even on NTZ input — cast back
      // so both sides' time types match (the operator requires it)
      val dim = ev.groupBy(col("event_type"),
          date_trunc("hour", col("ts")).cast("timestamp_ntz").as("ts"))
        .agg(round(avg("value"), 6).as("rate"))
        .filter(hour(col("ts")) % 4 === 0)
      graft.ops.AsOf.asofJoinNative(
        ev.select("event_id", "event_type", "ts"), dim,
        "event_type", "ts", broadcastRight = true)
        .select("event_id", "event_type", "ts", "rate")
        .orderBy("event_id")
    },
    Some("""WITH d AS (SELECT event_type, date_trunc('hour', ts) AS ts,
      |   round(avg(value), 6) AS rate
      |  FROM events GROUP BY 1, 2),
      |d4 AS (SELECT * FROM d WHERE extract(hour FROM ts) % 4 = 0)
      |SELECT e.event_id, e.event_type, e.ts, d.rate
      |FROM events e ASOF LEFT JOIN d4 d
      |  ON e.event_type = d.event_type AND e.ts >= d.ts
      |ORDER BY e.event_id""".stripMargin))

  /** The native as-of join through its round-14 SQL front door —
    * q142's attribution join issued as `FROM asof_join(TABLE(...),
    * TABLE(...), 'user_id', 'ts', 'backward')`
    * ([[graft.plans.AsOfSql]]), oracled by DuckDB's own `ASOF LEFT
    * JOIN`: the SQL surface proven against an independent engine's
    * NATIVE as-of semantics, not just against our DataFrame path
    * (that equality is AsOfSqlSpec's job). The TVF deliberately
    * carries no tiebreak dial, so the right side pre-aggregates
    * clicks to max(value) per (user_id, ts) — ties resolved in the
    * QUERY, identically on both engines. The physical plan is the
    * same AsOfJoinExec as q142: two clustered exchanges, one merge
    * walk, no window, O(1) state per key.
    */
  val q165 = Q("q165_asof_sql",
    (s, dir) => {
      Registry.events(s, dir).createOrReplaceTempView("q165_events")
      s.sql("""SELECT event_id, user_id, ts, click_ts, click_value
        |FROM asof_join(
        |  TABLE(SELECT event_id, user_id, ts FROM q165_events
        |        WHERE event_type = 'purchase'),
        |  TABLE(SELECT user_id, ts, ts AS click_ts,
        |               max(value) AS click_value
        |        FROM q165_events WHERE event_type = 'click'
        |        GROUP BY user_id, ts),
        |  'user_id', 'ts', 'backward')
        |ORDER BY event_id""".stripMargin)
    },
    Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
      |       WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts, max(value) AS click_value
      |      FROM events WHERE event_type = 'click'
      |      GROUP BY user_id, ts)
      |SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts,
      |       c.click_value
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin))

  val qs: Seq[Q] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13,
      q14, q15, q16, q17, q33, q34, q36, q37, q71, q72, q73, q76, q77,
      q80, q81, q87, q88, q89, q93, q94, q97, q98, q103, q104, q105,
      q122, q130, q142, q143, q144, q145, q165)
}
