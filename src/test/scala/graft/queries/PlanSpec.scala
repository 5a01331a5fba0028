package graft.queries

import graft.SparkSpec

/** Physical-plan assertions — the scale properties the queries claim
  * (pushdown, pruning, broadcast, top-k, codegen) must actually show
  * up in the executed plan, not just in comments.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: Q): String = {
    val df = q.run(spark, dir)
    df.collect() // execute so AQE finalizes and codegen spans appear
    df.queryExecution.executedPlan.toString
  }

  test("q01: filter pushed to parquet scan + whole-stage codegen") {
    val p = plan(Relational.q01)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    // `*(N)` node prefixes are the WholeStageCodegen span markers
    assert(p.contains("*(1) HashAggregate"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("q02: pushdown includes quantity+discount, schema pruned to 4 cols") {
    val p = plan(Relational.q02)
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("l_quantity"), p)
    // ReadSchema must not include unused columns like l_comment-ish ones
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_returnflag"), read)
  }

  test("q03: top-k compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan(Relational.q03)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortExec"), p)
  }

  test("q07: dimension join broadcasts (no shuffle of the fact side)") {
    val p = plan(Relational.q07)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q09: fact-first — lineitem streams, dim snowflake broadcasts") {
    val p = plan(Relational.q09)
    assert(p.contains("BroadcastHashJoin"), p)
    // the streamed (probe) side prints first in the tree: the fact
    // table must lead the chain, never sit under a BroadcastExchange
    // (the inverted chain broadcast the 600k-row lineitem build side)
    val li = p.indexOf("lineitem.parquet")
    assert(li >= 0, p)
    assert(li < p.indexOf("customer.parquet"), p)
    assert(li < p.indexOf("region.parquet"), p)
  }

  test("q27: query side broadcasts; no shuffle in brute-force cosine") {
    val p = plan(SimilarityQueries.q27)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    // candidate side must NOT be exchanged (only the broadcast)
    assert(!p.contains("ShuffleExchange") || p.contains("AQEShuffleRead") ||
      !p.split("BroadcastExchange").head.contains("Exchange hashpartitioning"), p)
  }

  test("q24: minhash aggregates partially before the shuffle") {
    val p = plan(TextQueries.q24)
    // partial_min markers indicate map-side combine of the 16 signatures
    assert(p.contains("partial_min") || p.contains("HashAggregate"), p)
  }

  test("q25: simhash runs zero shuffles (partition-local kernel)") {
    val q = TextQueries.q25
    val df = graft.ops.Dedup.simhash(
      Registry.table(spark, dir, "documents"), "doc_id", "text")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the only exchange allowed is the round-robin widen repartition —
    // no hashpartitioning (i.e. no aggregation shuffle)
    assert(!p.contains("hashpartitioning"), p)
    assert(q.name == "q25_simhash")
  }

  test("q32: IVF cell assignment is a partial aggregate, not a V×C window") {
    val df = graft.ops.Similarity.ivfCells(
      Registry.table(spark, dir, "embeddings"), "vec_id", "embedding",
      org.apache.spark.sql.functions.col("vec_id") % 50 === 7)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the argmax must partial-aggregate map-side (one row per vector
    // through the exchange), never shuffle the vector×centroid pair
    // table through a window exchange
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_max_by"), p)
  }

  test("q43: estimate-tier self-join reuses one exchange (kernel runs once)") {
    val df = graft.ops.Dedup.minhashEstimatePairs(
      Registry.table(spark, dir, "documents"), "doc_id", "text", 16, 4)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // both sides of the bucket self-join must consume the SAME
    // exchange — the signature kernel (one mapPartitions pass) is not
    // recomputed per side
    assert(p.contains("ReusedExchange"), p)
  }

  test("q36: two exact distincts share one Expand pass") {
    val p = plan(Relational.q36)
    assert(p.contains("Expand"), p)
  }

  test("q39: feature extraction plans no exchange (embarrassingly parallel)") {
    val p = plan(SimilarityQueries.q39)
    // orderBy at the tail is a range exchange for output ordering;
    // nothing upstream of it may shuffle
    val beforeSort = p.split("rangepartitioning").head
    assert(!beforeSort.contains("hashpartitioning"), p)
  }

  test("q81: probe batch broadcasts, dimension side never shuffles") {
    val p = plan(Relational.q81)
    assert(p.contains("BroadcastHashJoin"), p)
    // the ONLY allowed exchange is the output-ordering range exchange
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("q84: PQ encodes via partial aggregates, never a V×C window") {
    val df = graft.ops.Similarity.pqTopK(
      Registry.table(spark, dir, "embeddings"), "vec_id", "embedding",
      seedPred = org.apache.spark.sql.functions.col("vec_id") % 10 === 3,
      queryPred = org.apache.spark.sql.functions.col("vec_id") % 100 === 3,
      m = 2, subDim = 32, iters = 2, k = 10)
    df.collect()
    // AQE prints final + initial plans; count on the final only
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("partial_min_by"), p)
    // exactly ONE window — the per-query rank; the trainer and the
    // encodes must not smuggle a window in
    assert("\\bWindow\\b".r.findAllIn(p).length == 1, p)
  }

  test("q106: top-k aggregator partial-aggregates, window twin agrees") {
    val df = TextQueries.q106.run(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // typed Aggregator → ObjectHashAggregate with a map-side partial
    // stage: the exchange sees ≤ k·groups rows, never the corpus
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_bottomk") ||
      "ObjectHashAggregate".r.findAllIn(p).length >= 2, p)
    // and no Window anywhere — that is q91's plan, not this one
    assert(!"\\bWindow\\b".r.findAllIn(p).hasNext, p)
    // the two plans produce identical rows
    val a = df.collect().map(_.toSeq).toSet
    val b = TextQueries.q91.run(spark, dir).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("q87: three window functions share one shuffle (one window spec)") {
    val p = plan(Relational.q87).split("== Initial Plan ==").head
    // lag (change detect), row_number (version), lead (interval
    // close) all partition by (user_id, ts-order): one exchange
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
  }

  test("q103: user join broadcasts; ONE shuffle feeds the credit window") {
    val p = plan(Relational.q103).split("== Initial Plan ==").head
    // clicks broadcast onto purchases (no fact-side shuffle for the
    // join); the only hash exchange is the per-purchase count window
    assert(p.contains("BroadcastHashJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
    assert("Window \\[".r.findAllIn(p).length == 1, p)
  }

  test("q105: cohort join broadcasts; 3-shuffle ceiling holds") {
    val p = plan(Relational.q105).split("== Initial Plan ==").head
    // tiny per-user cohort frame broadcasts back onto events; the
    // hash exchanges are exactly: cohort min-agg, the distinct-user
    // pre-aggregate, and the final (c_day, day_offset) count
    assert(p.contains("BroadcastHashJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 3, p)
  }

  test("q117: model vector broadcasts; ONE doc-keyed shuffle") {
    val p = plan(TextQueries.q117).split("== Initial Plan ==").head
    // the 4096-row weight table is the build side; the token stream
    // never shuffles raw — only the per-doc partial aggregates do
    assert(p.contains("BroadcastHashJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("q120: weighted sample is a TakeOrdered, never a global sort") {
    val p = plan(TextQueries.q120)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortExec"), p)
  }

  test("q118: containment self-join consumes ONE shingle exchange") {
    val p = plan(TextQueries.q118)
    // the two join sides are plan-identical: the shingle kernel and
    // its windows run once, the second side is a ReusedExchange
    assert(p.contains("ReusedExchange"), p)
  }

  test("q121: ranking window partitions by cluster key, exactly one") {
    val p = plan(TextQueries.q121).split("== Initial Plan ==").head
    val windows = "\\bWindow\\b".r.findAllIn(p).length
    assert(windows == 1, s"$windows windows:\n$p")
    assert(p.contains("windowspecdefinition(cluster"), p)
  }

  test("q123: novelty is the shingle kernel + two exchanges, no more") {
    val p = plan(TextQueries.q123).split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2, p)
  }

  test("q98: the spine's type-dimension cross join is pinned broadcast") {
    // the distinct event-type frame is a bounded domain AQE would
    // USUALLY broadcast — the explicit hint removes the threshold
    // bistability (q64's fix applied to the last unpinned crossJoin)
    val p = plan(Relational.q98)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q128: overlap matrix is a broadcast cross join, ZERO shuffles") {
    // the whole point of reading contamination off STORED sketches:
    // a sources² cross join over a broadcast-sized stats frame —
    // never a corpus-sized exchange
    val p = plan(TextQueries.q128).split("== Initial Plan ==").head
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("q136: batch hybrid fusion ranks in bounded windows, no corpus-global sort") {
    // the serving-scale claim: both corpus-wide reductions are
    // distributed partial top-k (TakeOrderedAndProject), every
    // ranking window partitions by query id over <= 70-row frames —
    // the ONLY range exchange allowed is the final ~|queries|-row
    // output ordering
    val p = plan(SimilarityQueries.q136).split("== Initial Plan ==").head
    assert(p.contains("TakeOrderedAndProject"), p)
    assert("Exchange rangepartitioning".r.findAllIn(p).length <= 1, p)
  }

  test("q129: drift report is a broadcast join of two store scans, ZERO shuffles") {
    // same footing as q128: both snapshot frames are one row per
    // source, the old side is explicitly broadcast — the report must
    // never pay a corpus-sized (or any) exchange
    val p = plan(TextQueries.q129).split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }
}
