package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search. Two tiers:
  *
  * - brute-force cosine top-k: broadcast the (small) query set,
  *   stream the candidate side — no shuffle at all, scales linearly
  *   in candidates × queries and is the exactness baseline.
  * - sign-LSH ("IVF-ish") bucketing: an 8-bit sign signature over the
  *   leading dimensions partitions vectors into 256 coarse cells; the
  *   join is then bucket-equi + broadcast, touching only same-cell
  *   candidates. At 100 TB the bucket column becomes the partition /
  *   cluster key so the probe reads one cell, not the corpus.
  *
  * All arithmetic is double-precision element-fold in index order —
  * deterministic, and exactly reproducible by the DuckDB oracle.
  *
  * Measured scaling evidence (shuffle growth vs input growth,
  * sf0.01→sf0.1) for q31/q32/q54 is committed in SCALING.md — the
  * IVF argmax shuffles one row per vector, measured.
  */
object Similarity {

  /** Cast a float embedding to double and attach its L2 norm. */
  def withNorm(df: DataFrame, vecCol: String): DataFrame = {
    val e = col(vecCol).cast("array<double>")
    df.withColumn("_e", e)
      .withColumn("_nrm", sqrt(dot(col("_e"), col("_e"))))
  }

  /** Index-order dot product — the native codegen'd
    * [[graft.functions.DotProduct]] expression (the `zip_with` +
    * `aggregate` HOF formulation is CodegenFallback: boxed-Double
    * interpretation, GC-noisy at corpus scale).
    */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct(a, b)

  /** Sign signature over the first `bits` dimensions: '1' where the
    * coordinate is ≥ 0. Cheap coarse quantizer (random-hyperplane LSH
    * with axis-aligned planes).
    */
  def signBucket(vec: Column, bits: Int): Column =
    signBucketAt(vec, 1, bits)

  /** [[signBucket]] over dims [offset, offset+bits) (1-based) — the
    * slice dial that makes independent LSH tables out of one vector.
    */
  def signBucketAt(vec: Column, offset: Int, bits: Int): Column =
    concat((offset until offset + bits).map(i =>
      when(element_at(vec, i) >= 0, "1").otherwise("0")): _*)

  /** Brute-force cosine: queries (filtered by `queryPred`) broadcast
    * against all vectors; emits (qid, vec_id, cos) with cos ≥
    * threshold, self-pairs excluded, cos rounded to 6.
    */
  def cosineBruteForce(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, threshold: Double): DataFrame = {
    val base = withNorm(emb, vecCol)
      .select(col(idCol), col("_e"), col("_nrm"))
    val q = base.filter(queryPred)
      .select(col(idCol).as("qid"), col("_e").as("qe"), col("_nrm").as("qn"))
    val cos = round(dot(col("qe"), col("_e")) / (col("qn") * col("_nrm")), 6)
    base.crossJoin(broadcast(q))
      .filter(col("qid") =!= col(idCol))
      .select(col("qid"), col(idCol), cos.as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Deterministic Johnson–Lindenstrauss ±1 sign matrix as a tiny
    * in-engine frame (j, _sgn: array<double>): s(j,p) = +1 iff the
    * first 32 md5 bits of "j,p" are even — a dense Achlioptas-style
    * random projection with the hash standing in for the RNG, so
    * both engines derive the SAME matrix from nothing but
    * (outDim, inDim). outDim·inDim md5 calls total, run ONCE — never
    * per data row.
    */
  def jlSignMatrix(spark: org.apache.spark.sql.SparkSession,
      outDim: Int, inDim: Int): DataFrame =
    spark.range(outDim).toDF("j").select(col("j").cast("int").as("j"),
      transform(sequence(lit(0), lit(inDim - 1)), p =>
        when(conv(substring(md5(concat(col("j").cast("string"),
            lit(","), p.cast("string"))), 1, 8), 16, 10)
            .cast("long") % 2 === 0,
          lit(1.0)).otherwise(lit(-1.0))).as("_sgn"))

  /** Project `vecCol` (inDim floats) down to outDim dims through the
    * [[jlSignMatrix]]: _pe[j] = round(Σₚ v[p]·s(j,p), 6). The matrix
    * is outDim·inDim literal doubles — it collapses to driver-local
    * rows (the [[kmeansFit]] centroid-table pattern) and each output
    * dim is ONE fixed-order [[dot]] against a literal array, so the
    * projection plans ZERO exchanges and stays row-parallel: exactly
    * what a 100 TB corpus needs before the (now 4× cheaper) distance
    * math. Multiplying by ±1.0 is float-exact, so the fold is
    * bit-reproducible by the oracle's ordered `list_reduce`.
    */
  def jlProject(emb: DataFrame, idCol: String, vecCol: String,
      outDim: Int, inDim: Int): DataFrame = {
    require(outDim >= 1 && inDim >= 1, "dims must be >= 1")
    val signs = jlSignMatrix(emb.sparkSession, outDim, inDim)
      .collect().sortBy(_.getInt(0)).map(_.getSeq[Double](1))
    val v = col(vecCol).cast("array<double>")
    emb.select(col(idCol),
      array(signs.toIndexedSeq
        .map(s => round(dot(v, typedLit(s)), 6)): _*).as("_pe"))
  }

  /** Brute-force cosine top-k in JL-projected space — the
    * dimensionality-reduction ANN tier: distance math runs on
    * outDim-double vectors (4× fewer multiplies at 64→16) while
    * recall against the full-dim truth is measured by
    * [[recallAgainstExact]] (q116). Same deterministic ranking
    * contract as [[cosineTopK]]: rounded cos desc, id asc.
    */
  def jlTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, outDim: Int, inDim: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val base = jlProject(emb, idCol, vecCol, outDim, inDim)
      .withColumn("_nrm", sqrt(dot(col("_pe"), col("_pe"))))
    val q = base.filter(queryPred)
      .select(col(idCol).as("qid"), col("_pe").as("_qe"),
        col("_nrm").as("_qn"))
    val cos = round(dot(col("_qe"), col("_pe")) /
      (col("_qn") * col("_nrm")), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col(idCol).asc)
    base.crossJoin(broadcast(q))
      .filter(col("qid") =!= col(idCol))
      .select(col("qid"), col(idCol), cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF cell assignment: centroids are the vectors matching
    * `centroidPred` (a deterministic sample — a k-means fit would slot
    * in here unchanged); every vector joins the cell of its
    * max-cosine centroid (rounded, centroid-id tiebreak — exactly
    * reproducible in SQL). Centroids broadcast; the argmax is a
    * PARTIAL AGGREGATE (`max_by` keyed by vector): the max is
    * associative, so each task reduces its own (vector × centroid)
    * pairs map-side and the exchange carries ONE row per vector — not
    * the V×C pair table. (The previous shape ran `row_number` over a
    * window partitioned by vector, which shuffled every pair through
    * the exchange before discarding all but one row per vector: a C×
    * data expansion through the shuffle — with thousands of centroids,
    * the plan that dies first at 100×.) At 100 TB the cell column
    * becomes the partition key, so a probe reads one cell, not the
    * corpus.
    */
  def ivfCells(emb: DataFrame, idCol: String, vecCol: String,
      centroidPred: Column): DataFrame = {
    val base = withNorm(emb, vecCol).select(col(idCol), col("_e"), col("_nrm"))
    val cents = base.filter(centroidPred)
      .select(col(idCol).as("cid"), col("_e").as("_ce"), col("_nrm").as("_cn"))
    // a predicate matching nothing would silently empty every cell —
    // fail loudly instead. The check is an EXTRA eager job (a take(1)
    // over the filtered scan): cheap here, but at 100 TB it re-scans
    // the corpus before the real work — disable via conf and rely on
    // downstream emptiness monitoring instead.
    if (emb.sparkSession.conf
        .get("spark.graft.ivf.validateCentroids", "true").toBoolean)
      require(!cents.isEmpty,
        "centroidPred matched no rows — IVF needs at least one centroid")
    assignCosineCells(emb, idCol, vecCol, cents)
  }

  /** [[ivfCells]]' max-cosine argmax against an EXPLICIT centroid
    * frame (cid, _ce, _cn) — in-memory or re-read from a persisted
    * index ([[AnnIndexStore]]): parquet round-trips doubles exactly,
    * so assignments are bit-identical either way. Emits one
    * (id, _e, _nrm, cell) row per input vector.
    */
  def assignCosineCells(emb: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame): DataFrame = {
    val base = withNorm(emb, vecCol).select(col(idCol), col("_e"), col("_nrm"))
    val cos = round(dot(col("_e"), col("_ce")) / (col("_nrm") * col("_cn")), 6)
    // argmax = max of (cos, -cid) lexicographically: highest rounded
    // cos, centroid-id ascending on ties — identical semantics to a
    // `row_number() over (order by cos desc, cid asc) = 1` window, but
    // expressed as an associative aggregate so it partial-aggregates
    // map-side (the oracle keeps the window formulation; same result)
    base.crossJoin(broadcast(cents))
      .withColumn("_ccos", cos)
      .groupBy(col(idCol))
      .agg(max_by(
        struct(col("_e"), col("_nrm"), col("cid")),
        struct(col("_ccos").as("c"), (-col("cid")).as("nc"))).as("_best"))
      .select(col(idCol), col("_best._e").as("_e"),
        col("_best._nrm").as("_nrm"), col("_best.cid").as("cell"))
  }

  /** IVF search: every query probes its `nprobe` NEAREST centroids'
    * cells (same rounded-cos + centroid-id ranking as the cell
    * assignment, so nprobe=1 probes exactly the query's own cell).
    * nprobe=1 has a recall cliff for queries near a cell boundary —
    * their true neighbors sit just across it; probing the top-2/3
    * cells is the standard recall/cost dial and only multiplies the
    * (broadcast) probe list, never the corpus-side scan.
    *
    * The assignment feeds both the corpus join side and the (small)
    * query side. No persist is needed: `queryPred` references only the
    * grouping key, so Catalyst pushes it through the argmax aggregate
    * down to the scan — the query side computes its own assignment
    * over just the query rows (|Q|×C pairs, trivial) instead of
    * re-running the corpus-wide V×C argmax. Nothing is cached, so
    * nothing outlives the query (see UnpersistSpec).
    */
  def ivfSearch(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, centroidPred: Column,
      threshold: Double, nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, "nprobe must be >= 1")
    val cells = ivfCells(emb, idCol, vecCol, centroidPred)
    val q = cells.filter(queryPred)
      .select(col(idCol).as("qid"), col("_e").as("_qe"),
        col("_nrm").as("_qn"), col("cell").as("_qcell"))
    val probes =
      if (nprobe == 1) q // own cell — the assignment already ranked it
      else {
        val cents = withNorm(emb, vecCol).filter(centroidPred)
          .select(col(idCol).as("cid"), col("_e").as("_ce"),
            col("_nrm").as("_cn"))
        val qcos = round(
          dot(col("_qe"), col("_ce")) / (col("_qn") * col("_cn")), 6)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("_qcos").desc, col("cid").asc)
        q.drop("_qcell").crossJoin(broadcast(cents))
          .withColumn("_qcos", qcos)
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") <= nprobe)
          .select(col("qid"), col("_qe"), col("_qn"),
            col("cid").as("_qcell"))
      }
    val cos = round(dot(col("_qe"), col("_e")) / (col("_qn") * col("_nrm")), 6)
    cells.join(broadcast(probes),
        col("cell") === col("_qcell") && col("qid") =!= col(idCol))
      .select(col("qid"), col(idCol), cos.as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Top-k nearest neighbors per query — what real ANN callers ask
    * for (thresholds are corpus-dependent; k isn't). Candidates come
    * from the sign-LSH cell ([[cosineBucketed]] with the threshold
    * open), ranked per query by (cos desc, id asc — deterministic tie
    * break on the rounded score). The ranking window partitions by
    * QUERY id: per-task state is one query's candidate list, bounded
    * by its cell size — never corpus-scale (contrast the V×C argmax
    * this module used to run, fixed in [[ivfCells]]). Emits
    * (qid, id, cos, rank) with rank ≤ k.
    */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, bits: Int = 8): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val cand = cosineBucketed(emb, idCol, vecCol, queryPred,
      threshold = -1.0, bits) // cos ≥ -1 always: rank decides, not a cut
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col(idCol).asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Lloyd k-means centroid training as pure DataFrame aggregates —
    * the fit that [[ivfCells]]' scaladoc promises would "slot in
    * unchanged": train here, then pass the result as the centroid
    * side of an IVF index. Deterministic end to end, so the whole
    * trainer is DuckDB-oracle-checkable:
    *
    * - init: the vectors matching `seedPred` (k-means++ would add a
    *   weighted-sampling pass; deterministic seeds keep the trainer
    *   reproducible and oracle-expressible).
    * - assign: argmin squared-euclidean, computed as |c|² − 2·a·c
    *   (the |a|² term is per-vector constant and dropped). Both dot
    *   products are index-order folds ([[dot]]) — bit-exact against
    *   the generated SQL — and the argmin is the [[ivfCells]]
    *   partial-aggregate shape: `min_by` keyed by vector, ONE row
    *   per vector through the exchange, centroids broadcast.
    * - recompute: element-wise mean via `posexplode` → ONE
    *   hash-aggregate over (cid, dim). Map-side partials reduce each
    *   task's output to ≤ k·d rows before the shuffle, so the
    *   exchange carries tasks·k·d rows regardless of corpus size.
    *   The mean is the loop's only cross-row double sum — its
    *   addition order is engine-dependent, so it is ROUNDED to 6
    *   decimals immediately; every later iteration consumes the
    *   rounded values, keeping Spark and the oracle in lockstep.
    *
    * A cluster that captures no vectors simply vanishes from the
    * aggregate (standard Lloyd degeneracy; the oracle mirrors it).
    * Per iteration: one broadcast join + two linear shuffles; the
    * driver never materializes VECTORS — each iteration's k·d-double
    * centroid table collapses to a local relation
    * ([[materializeSmall]]), which cuts the lineage the way a
    * checkpoint would at 100 TB: without the cut, every downstream
    * consumer (the next iteration, each assignment/distance branch)
    * re-runs the whole trainer.
    *
    * Emits the trained centroids as (cluster, dim, val) rows with
    * `dim` 1-based — the row shape joins/oracles handle better than
    * nested arrays.
    */
  def kmeansCentroids(emb: DataFrame, idCol: String, vecCol: String,
      seedPred: Column, iters: Int): DataFrame =
    kmeansFit(emb, idCol, vecCol, seedPred, iters)
      .select(col("cid").as("cluster"), posexplode(col("_ce")).as(Seq("p", "val")))
      .select(col("cluster"), (col("p") + 1).cast("int").as("dim"), col("val"))

  /** [[kmeansCentroids]] in array form — (cid, _ce: array<double>) —
    * the shape [[semDedup]] and an IVF build consume directly.
    */
  def kmeansFit(emb: DataFrame, idCol: String, vecCol: String,
      seedPred: Column, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val base = emb.select(col(idCol),
      col(vecCol).cast("array<double>").as("_e"))
    var cents = base.filter(seedPred)
      .select(col(idCol).cast("long").as("cid"), col("_e").as("_ce"))
    for (_ <- 1 to iters) {
      val asg = assignEuclid(base, cents)
      val means = asg
        .select(col("cid"), posexplode(col("_e")).as(Seq("p", "v")))
        .groupBy(col("cid"), col("p"))
        .agg(round(sum("v") / count(lit(1)), 6).as("val"))
      // rebuild the array form: k·d rows in, k rows out — the
      // interpreted `transform` lambda touches only this tiny frame
      cents = materializeSmall(means.groupBy("cid")
        .agg(sort_array(collect_list(struct(col("p"), col("val"))))
          .as("_pv"))
        .select(col("cid"),
          transform(col("_pv"), x => x.getField("val")).as("_ce")))
    }
    cents
  }

  /** Collapse a TINY frame (centroid tables: k·d doubles) to a local
    * relation. Lazy chains re-execute their lineage once per
    * consumer — a trainer's centroids feed the next iteration AND
    * every downstream assignment/distance-table branch, so without a
    * cut the whole trainer re-runs per branch. `persist()` is the
    * move when the frame might be large; for k·d doubles the local
    * relation is strictly better: nothing to unpersist (cache-
    * hygiene stays trivial, see UnpersistSpec), and downstream
    * broadcasts read driver-local rows. Values are bit-identical —
    * collect carries the exact doubles.
    */
  private def materializeSmall(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(df.collect(): _*), df.schema)

  /** Collect a centroid frame (cid, _ce, _cn) into ONE
    * `array<struct>` literal for [[graft.functions.NearestCosineCell]]
    * — the zero-shuffle encode path ([[graft.ops.AnnIndexStore]]'s
    * build/add). The frame is broadcast-sized by the store contract
    * (it is the broadcast side of every assignment already), so the
    * driver collect moves the same bytes a broadcast would. Rows are
    * sorted by cid for stability; the argbest is order-independent
    * either way (deterministic tie-breaks). Empty frames are the
    * caller's guard (an empty model must yield an EMPTY encode, the
    * join formulation's semantics — not a fold over nothing).
    */
  /** Ceiling (ROWS per model table) above which the literal-embedded
    * encode falls back to the broadcast-join formulation: a model
    * literal is serialized into EVERY task binary, so while the k·d
    * tables the stores train today are a few KB, an unguarded
    * `collect()` at 100 TB-scale IVF (k up to 10⁴–10⁵) would embed
    * tens of MB per task — past this ceiling the old join+aggregate
    * plan is the right one (the r17 verdict's size-guard item). The
    * default (32768 rows ≈ 16 MB of doubles at dim 64) stays far
    * above every battery/spec model and far below the broadcast cap.
    */
  val ModelLiteralMaxRows = "spark.graft.ann.modelLiteralMaxRows"
  private[ops] def literalMaxRows(
      s: org.apache.spark.sql.SparkSession): Int =
    s.conf.get(ModelLiteralMaxRows, "32768").toInt

  /** [[centroidsLiteral]] behind the row ceiling: None (fall back to
    * the join formulation) when the table exceeds `maxRows`. The
    * check is POST-collect (length of the collected array): the model
    * frame is driver-materialized by every formulation anyway (the
    * join path broadcasts it; pqTrain collects it per iteration), so
    * a pre-collect `limit(n+1)` probe would only guard what is
    * already the status quo — and was MEASURED to cost 2+ extra
    * incremental-take jobs per call at bench SF (q149 +13%). What the
    * ceiling actually protects is the LITERAL: embedding the table in
    * every task binary. */
  private[ops] def centroidsLiteralOpt(cents: DataFrame,
      maxRows: Int): Option[(Column, Long)] = {
    val rows = cents.select(col("cid").cast("long"),
        col("_ce").cast("array<double>"), col("_cn").cast("double"))
      .collect()
    if (rows.length > maxRows) None
    else Some(centroidsLiteralOf(rows))
  }

  private[ops] def centroidsLiteral(cents: DataFrame): (Column, Long) =
    centroidsLiteralOf(cents.select(col("cid").cast("long"),
      col("_ce").cast("array<double>"), col("_cn").cast("double"))
      .collect())

  private def centroidsLiteralOf(
      collected: Array[org.apache.spark.sql.Row]): (Column, Long) = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val rows = collected.sortBy(_.getLong(0))
    val data = new GenericArrayData(rows.map(r => InternalRow(
      r.getLong(0), new GenericArrayData(r.getSeq[Double](1).toArray),
      r.getDouble(2))))
    val tpe = ArrayType(StructType(Seq(StructField("cid", LongType),
      StructField("_ce", ArrayType(DoubleType)),
      StructField("_cn", DoubleType))))
    (org.apache.spark.sql.graft.Shims.column(Literal(data, tpe)),
      rows.length.toLong)
  }

  /** Collect a PQ codebook frame (_sj, cid, _ce) into ONE
    * `array<struct>` literal for [[graft.functions.NearestPqCode]] —
    * the codebooks are already driver-materialized every Lloyd
    * iteration ([[pqTrain]]'s `materializeSmall`), so this adds no new
    * driver pressure. Same empty-frame caller guard as
    * [[centroidsLiteral]].
    */
  /** [[codebooksLiteral]] behind the row ceiling — the
    * [[centroidsLiteralOpt]] contract (post-collect length check)
    * for the PQ codebook table. */
  private[ops] def codebooksLiteralOpt(cb: DataFrame,
      maxRows: Int): Option[(Column, Long)] = {
    val rows = cb.select(col("_sj").cast("int"),
        col("cid").cast("long"), col("_ce").cast("array<double>"))
      .collect()
    if (rows.length > maxRows) None
    else Some(codebooksLiteralOf(rows))
  }

  private[ops] def codebooksLiteral(cb: DataFrame): (Column, Long) =
    codebooksLiteralOf(cb.select(col("_sj").cast("int"),
      col("cid").cast("long"), col("_ce").cast("array<double>"))
      .collect())

  private def codebooksLiteralOf(
      collected: Array[org.apache.spark.sql.Row]): (Column, Long) = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val rows = collected.sortBy(r => (r.getInt(0), r.getLong(1)))
    val data = new GenericArrayData(rows.map(r => InternalRow(
      r.getInt(0), r.getLong(1),
      new GenericArrayData(r.getSeq[Double](2).toArray))))
    val tpe = ArrayType(StructType(Seq(StructField("_sj", IntegerType),
      StructField("cid", LongType),
      StructField("_ce", ArrayType(DoubleType)))))
    (org.apache.spark.sql.graft.Shims.column(Literal(data, tpe)),
      rows.length.toLong)
  }

  /** Incremental index maintenance — the reference's high-water
    * pattern (fetch only what's new) lifted to ANN: train/keep
    * centroids over HISTORY once, then assign only the NEW batch to
    * its cells. One broadcast of the (tiny) centroid frame against a
    * scan of just the batch; the corpus is never re-read, which is
    * the daily operation for a 100 TB vector index. Emits (id, cell).
    */
  def assignToCentroids(emb: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame): DataFrame = {
    val base = emb.select(col(idCol),
      col(vecCol).cast("array<double>").as("_e"))
    assignEuclid(base, cents).select(col(idCol), col("cid").as("cell"))
  }

  /** Argmin-squared-euclidean assignment of `base` (id, _e) rows to a
    * broadcast centroid frame (cid, _ce): the [[ivfCells]]
    * partial-aggregate shape — `min_by` keyed by vector, one row per
    * vector through the exchange. Keeps `_e` (and its id) on the
    * output row for downstream recompute/pairing.
    */
  private def assignEuclid(base: DataFrame, cents: DataFrame): DataFrame = {
    val idCol = base.columns.head
    val score = dot(col("_ce"), col("_ce")) -
      lit(2.0) * dot(col("_e"), col("_ce"))
    base.crossJoin(broadcast(cents))
      .withColumn("_s", score)
      .groupBy(col(idCol))
      .agg(min_by(struct(col("cid"), col("_e")),
        struct(col("_s"), col("cid"))).as("_best"))
      .select(col(idCol), col("_best.cid").as("cid"),
        col("_best._e").as("_e"))
  }

  /** SemDedup (semantic dedup over embeddings, Abbas et al. 2023
    * shape): cluster the corpus, then inside each cluster drop every
    * vector that has a LOWER-id neighbor at cosine ≥ `threshold`
    * (keep-lowest-id — the deterministic version of the paper's
    * keep-one rule). `cents` is an array-form centroid frame
    * ([[kmeansFit]] output, or any (cid, _ce) frame); assignment is
    * the same argmin-euclidean partial aggregate the trainer uses.
    *
    * Shape at 100 TB: centroids broadcast; the pair scan self-joins
    * shuffle-partitioned by CELL (the [[graft.ops.Dedup.embeddingNearDups]]
    * bucketed-not-all-pairs shape — per-task work is bounded by cell
    * size, k is the dial); the dropped set re-joins broadcast/AQE.
    * The assignment feeds three plan branches — at production scale
    * persist it; here the self-join's two sides are plan-identical,
    * so ReuseExchange computes it once (nothing cached, see
    * UnpersistSpec).
    *
    * Emits one row per vector: (id, cell, kept).
    */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, threshold: Double): DataFrame = {
    val base = emb.select(col(idCol),
      col(vecCol).cast("array<double>").as("_e"))
    val asg = assignEuclid(base, cents)
      .withColumn("_nrm", sqrt(dot(col("_e"), col("_e"))))
      .select(col(idCol), col("cid").as("cell"), col("_e"), col("_nrm"))
    val l = asg.select(col("cell"), col(idCol).as("a"),
      col("_e").as("_ea"), col("_nrm").as("_na"))
    val r = asg.select(col("cell"), col(idCol).as("b"),
      col("_e").as("_eb"), col("_nrm").as("_nb"))
    val cos = round(dot(col("_ea"), col("_eb")) / (col("_na") * col("_nb")), 6)
    val dropped = l.join(r, "cell")
      .filter(col("a") < col("b"))
      .withColumn("_cos", cos)
      .filter(col("_cos") >= threshold)
      .select(col("b").as(idCol)).distinct()
      .withColumn("_d", lit(1))
    asg.select(col(idCol), col("cell"))
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cell"), col("_d").isNull.as("kept"))
  }

  /** Multi-table sign-LSH top-k: each table is an independent
    * (offset, bits) slice of the vector; candidates are the UNION of
    * same-cell pairs over all tables — the standard recall dial (a
    * near neighbor is missed only if it disagrees in EVERY table).
    * Planned like minhash's LSH bands: each vector explodes into one
    * (table, bucket) row per table, so the whole candidate pass is
    * ONE broadcast join regardless of the table count — not r corpus
    * scans. Pairs colliding in several tables dedupe before ranking.
    */
  def multiTableTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, tables: Seq[(Int, Int)]): DataFrame = {
    require(k >= 1 && tables.nonEmpty, "need k >= 1 and >= 1 table")
    val base = withNorm(emb, vecCol)
      .select(col(idCol), col("_e"), col("_nrm"))
    def banded(df: DataFrame) = df.withColumn("_b",
        explode(array(tables.zipWithIndex.map { case ((off, bits), j) =>
          struct(lit(j).as("tbl"),
            signBucketAt(col("_e"), off, bits).as("bkt"))
        }: _*)))
      .select(col(idCol), col("_e"), col("_nrm"),
        col("_b.tbl").as("_tbl"), col("_b.bkt").as("_bkt"))
    val cand = banded(base)
    val q = banded(base.filter(queryPred))
      .select(col(idCol).as("qid"), col("_e").as("qe"),
        col("_nrm").as("qn"), col("_tbl"), col("_bkt"))
    val cos = round(dot(col("qe"), col("_e")) / (col("qn") * col("_nrm")), 6)
    val pairs = cand.join(broadcast(q),
        Seq("_tbl", "_bkt")).filter(col("qid") =!= col(idCol))
      .select(col("qid"), col(idCol), cos.as("cos"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col(idCol).asc)
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Recall@k of an approximate top-k frame (qid, id, cos, rank ≤ k)
    * against the exact brute-force top-k — the evaluation every ANN
    * deployment runs before turning a knob: per query,
    * |approx ∩ true| / k. Both rankings use the same deterministic
    * (rounded cos desc, id asc) order. The exact side is the
    * brute-force broadcast scan (the baseline you can afford on a
    * SAMPLED query set, which is how recall is measured at 100 TB —
    * the query side is small by construction; the corpus side
    * streams once).
    */
  def recallAgainstExact(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, approx: DataFrame): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col(idCol).asc)
    val exact = cosineBruteForce(emb, idCol, vecCol, queryPred,
        threshold = -1.0)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    // The approx side is ≤ queries×k rows by contract (rank ≤ k), but
    // AQE's estimated stats for it sit right at the broadcast threshold
    // and the join was observed flipping broadcast↔shuffle between
    // otherwise-identical runs (2 vs 4 shuffles in the audited plan).
    // Pin it: for a LEFT OUTER join only the right side can build the
    // broadcast table, and the right side here is the bounded one.
    exact.as("t").join(broadcast(approx.as("a")),
        col("t.qid") === col("a.qid") &&
          col(s"t.$idCol") === col(s"a.$idCol"), "left")
      .groupBy(col("t.qid").as("qid"))
      .agg(count(col(s"a.$idCol")).as("n_hit"))
      .withColumn("recall", round(col("n_hit") / lit(k), 4))
  }

  /** [[recallAgainstExact]] of the single-table [[cosineTopK]]. */
  def annRecallAtK(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, bits: Int = 8): DataFrame =
    recallAgainstExact(emb, idCol, vecCol, queryPred, k,
      cosineTopK(emb, idCol, vecCol, queryPred, k, bits))

  /** Symmetric per-vector int8 quantization — the memory move that
    * makes a 100 TB ANN index fit (4× smaller than float32, 8× than
    * the double working form): scale = max|x|/127 per vector,
    * qᵥ = round(x/scale) ∈ [−127, 127]. Emitted as (id, dim, qv,
    * scale) rows. One explode + one max-window keyed by vector id —
    * a single linear shuffle; at rest the quantized column would be
    * packed back to a binary blob per vector. Zero vectors quantize
    * to all-zeros (scale 0 sentinel) rather than NaN.
    */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(idCol)
    emb.select(col(idCol),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("p", "v")))
      .withColumn("_mx", max(abs(col("v"))).over(w))
      .select(col(idCol), (col("p") + 1).cast("int").as("dim"),
        when(col("_mx") === 0, 0)
          .otherwise(round(col("v") / (col("_mx") / 127.0), 0))
          .cast("int").as("qv"),
        round(col("_mx") / 127.0, 6).as("scale"))
  }

  /** Product-quantization top-k (Jégou et al. 2011 shape, trained
    * with [[kmeansFit]]): split every vector into `m` contiguous
    * `subDim`-wide subspaces, Lloyd-train a codebook per subspace,
    * encode each vector as `m` small codes, and answer queries by
    * ASYMMETRIC DISTANCE — the query precomputes one (code →
    * squared-L2-to-its-slice) table per subspace, and a database
    * vector's distance is the sum of `m` table lookups.
    *
    * Why this is the 100 TB ANN shape: the corpus at rest is m·log₂k
    * BITS per vector instead of d floats (64 dims of float32 → 2
    * bytes at m=2, k≤256) — the index FITS, which is the actual
    * constraint at scale. The scan stays exhaustive but touches only
    * code columns; composing with [[ivfCells]] (probe then ADC-scan
    * the cell) is the standard IVFPQ stack, both halves of which now
    * exist here.
    *
    * Plan shape: each codebook trains on a sliced projection (two
    * linear shuffles per Lloyd iteration, centroids broadcast);
    * encoding is the same min_by partial aggregate as [[ivfCells]] —
    * ONE row per vector through each exchange, never V×C; the m code
    * frames join on id (linear); the per-query distance tables are
    * (queries × k) rows, broadcast onto the code scan. The ranking
    * window partitions by query id.
    *
    * Oracle discipline: each subspace distance rounds to 6 (its two
    * dot products are index-order folds), the ADC sum re-rounds the
    * fixed-order m-term sum, rank ties break (adc asc, id asc).
    * Emits (qid, id, adc, rank ≤ k), self-pairs excluded.
    */
  def pqTopK(emb: DataFrame, idCol: String, vecCol: String,
      seedPred: Column, queryPred: Column, m: Int, subDim: Int,
      iters: Int, k: Int): DataFrame = {
    require(m >= 1 && subDim >= 1 && k >= 1, "m, subDim, k must be >= 1")
    val (codes, dts) = pqSub(emb, idCol, vecCol, seedPred, queryPred,
      m, subDim, iters)
    val joined = dts.zipWithIndex.foldLeft(codes) {
      case (acc, (dt, j)) =>
        val cond = acc(s"_c$j") === dt(s"_cid$j") &&
          (if (j == 0) lit(true) else acc("_qid0") === dt(s"_qid$j"))
        acc.join(broadcast(dt), cond)
    }
    pqRank(joined.withColumn("qid", col("_qid0")), idCol, m, k)
  }

  /** IVFPQ — the production ANN stack, composed from its two halves:
    * [[ivfCells]]' coarse quantizer restricts candidates to the
    * query's cell, [[pqTopK]]'s product codes answer the distance.
    * The cell restriction happens BEFORE the distance-table joins,
    * so per-query work is one cell's codes, not the corpus — at
    * 100 TB the scan reads only the probed cell's (tiny) code rows.
    * This is the no-residual variant (codes over raw vectors); the
    * residual refinement changes the codebook input, not the plan.
    * Emits (qid, id, adc, rank ≤ k) with rank ties broken
    * (adc asc, id asc), self-pairs excluded.
    */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String,
      centroidPred: Column, seedPred: Column, queryPred: Column,
      m: Int, subDim: Int, iters: Int, k: Int): DataFrame = {
    require(m >= 1 && subDim >= 1 && k >= 1, "m, subDim, k must be >= 1")
    val cells = ivfCells(emb, idCol, vecCol, centroidPred)
      .select(col(idCol), col("cell"))
    val qcells = cells.filter(queryPred)
      .select(col(idCol).as("qid"), col("cell").as("_qcell"))
    val (codes, dts) = pqSub(emb, idCol, vecCol, seedPred, queryPred,
      m, subDim, iters)
    // candidate restriction FIRST: same coarse cell, self excluded
    val cand = codes.join(cells, idCol)
      .join(broadcast(qcells),
        col("cell") === col("_qcell") && col("qid") =!= col(idCol))
    val joined = dts.zipWithIndex.foldLeft(cand) {
      case (acc, (dt, j)) =>
        acc.join(broadcast(dt), acc(s"_c$j") === dt(s"_cid$j") &&
          acc("qid") === dt(s"_qid$j"))
    }
    pqRank(joined, idCol, m, k)
  }

  /** Nearest-centroid classification — the few-shot probe that
    * doubles as an embedding-quality check: per-label mean vectors
    * (element-wise means rounded to 6, the trainer discipline),
    * every vector assigned to its nearest label centroid by the same
    * argmin partial aggregate as [[ivfCells]]/[[kmeansFit]]. Labels
    * are few, so the centroid frame broadcasts; the assignment
    * shuffles ONE row per vector. Emits (id, label, pred).
    */
  def centroidClassify(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val base = emb.select(col(idCol), col(labelCol),
      col(vecCol).cast("array<double>").as("_e"))
    val cents = base
      .select(col(labelCol), posexplode(col("_e")).as(Seq("p", "v")))
      .groupBy(col(labelCol), col("p"))
      .agg(round(sum("v") / count(lit(1)), 6).as("val"))
      .groupBy(labelCol)
      .agg(sort_array(collect_list(struct(col("p"), col("val"))))
        .as("_pv"))
      .select(col(labelCol).cast("long").as("cid"),
        transform(col("_pv"), x => x.getField("val")).as("_ce"))
    assignEuclid(base.select(col(idCol), col("_e")), cents)
      .select(col(idCol), col("cid").as("pred"))
      .join(base.select(col(idCol), col(labelCol)), idCol)
      .select(col(idCol), col(labelCol), col("pred"))
  }

  /** All `m` PQ sub-codebooks trained in ONE keyed Lloyd loop — the
    * shape that matters at production m (8–16 subspaces): the
    * subspace index is a GROUPING KEY (_sj, cid), not a reason to
    * schedule m separate trainer job chains. Per iteration: one
    * assignment pass over the exploded (sub, id, slice) rows, one
    * mean pass, ONE driver materialization of the m·k·subDim-double
    * codebook table (previously m of each, per iteration). Encoding
    * is one partial-aggregate pass + one groupBy pivot to the wide
    * (id, _c0.._c{m-1}) frame — replacing the former m-way self-join
    * on id. Per-subspace math is identical to m independent
    * [[kmeansFit]] runs (same seeds, same (dist, cid) tiebreak, same
    * rounded means), so results stay bit-compatible with the q84/q90
    * oracles' per-subspace recomputation.
    * Returns (wide codes frame, per-subspace broadcastable distance
    * tables (_qidj, _cidj, _dj)).
    */
  private def pqSub(emb: DataFrame, idCol: String, vecCol: String,
      seedPred: Column, queryPred: Column, m: Int, subDim: Int,
      iters: Int): (DataFrame, Seq[DataFrame]) = {
    val cents = pqTrain(emb, idCol, vecCol, seedPred, m, subDim, iters)
    (pqEncode(emb, idCol, vecCol, cents, m, subDim),
      pqDistTables(emb.filter(queryPred), idCol, vecCol, cents, m, subDim))
  }

  /** Exploded (id, _sj, _e-slice) rows — the keyed-subspace frame the
    * PQ trainer, encoder and distance-table builder all derive from.
    */
  private def pqSubRows(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int): DataFrame = {
    val slices = (0 until m).map(j =>
      struct(lit(j).as("_sj"),
        slice(col(vecCol).cast("array<double>"), j * subDim + 1, subDim)
          .as("_se")))
    emb.select(col(idCol), explode(array(slices: _*)).as("_s"))
      .select(col(idCol), col("_s._sj").as("_sj"), col("_s._se").as("_e"))
  }

  /** Train all `m` PQ sub-codebooks in one keyed Lloyd loop and
    * return the (tiny, driver-materialized) codebook frame
    * (_sj, cid, _ce) — the model artifact a persisted index stores
    * ([[AnnIndexStore]]) and [[pqEncode]]/[[pqDistTables]] consume.
    * Bit-compatible with `m` independent [[kmeansFit]] runs (same
    * seeds, same (dist, cid) tiebreak, same rounded means), so
    * results stay in lockstep with the q84/q90 oracles' per-subspace
    * recomputation.
    */
  def pqTrain(emb: DataFrame, idCol: String, vecCol: String,
      seedPred: Column, m: Int, subDim: Int, iters: Int): DataFrame = {
    val subRows = pqSubRows(emb, idCol, vecCol, m, subDim)
    var cents = subRows.filter(seedPred)
      .select(col("_sj"), col(idCol).cast("long").as("cid"),
        col("_e").as("_ce"))
    val maxLit = literalMaxRows(emb.sparkSession)
    for (_ <- 1 to iters) {
      // per-row argmin against the codebook LITERAL (the same frame
      // materializeSmall collects each iteration anyway) instead of
      // the broadcast-join + keyed groupBy: one corpus-sized Exchange
      // REMOVED per Lloyd iteration, same assignment bit-for-bit
      // ([[graft.functions.NearestPqCode]] replicates
      // `assignEuclidKeyed`'s score and (score, cid) tie-break;
      // NearestCodeSpec pins fused == join, boundary included).
      // Above the [[ModelLiteralMaxRows]] ceiling the literal would
      // bloat every task binary — fall back to the broadcast-join
      // formulation, which computes the identical assignment.
      val asg = codebooksLiteralOpt(cents, maxLit) match {
        case Some((cbLit, nCb)) =>
          // empty seeds assign nothing — the inner-join semantics of
          // the formulation this replaces
          subRows.select(col("_sj"), col(idCol),
              graft.functions.NearestPqCode(col("_e"), col("_sj"),
                cbLit).as("cid"), col("_e"))
            .filter(lit(nCb > 0))
        case None => assignEuclidKeyed(subRows, cents, idCol)
      }
      val means = asg
        .select(col("_sj"), col("cid"), posexplode(col("_e")).as(Seq("p", "v")))
        .groupBy(col("_sj"), col("cid"), col("p"))
        .agg(round(sum("v") / count(lit(1)), 6).as("val"))
      cents = materializeSmall(means.groupBy("_sj", "cid")
        .agg(sort_array(collect_list(struct(col("p"), col("val"))))
          .as("_pv"))
        .select(col("_sj"), col("cid"),
          transform(col("_pv"), x => x.getField("val")).as("_ce")))
    }
    cents
  }

  /** Encode every vector against `codebooks` (the [[pqTrain]] frame,
    * in-memory or re-read from storage — exact doubles either way):
    * one partial-aggregate assignment pass over the exploded subspace
    * rows, one groupBy pivot to the wide (id, _c0.._c{m-1}) frame.
    * Per-row independent, so encoding a NEW batch with stored
    * codebooks appends exactly the rows a full re-encode would —
    * the incremental-index contract [[AnnIndexStore.add]] relies on.
    */
  def pqEncode(emb: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, m: Int, subDim: Int): DataFrame =
    assignEuclidKeyed(pqSubRows(emb, idCol, vecCol, m, subDim),
        codebooks, idCol)
      .groupBy(col(idCol))
      .agg(max(when(col("_sj") === 0, col("cid"))).as("_c0"),
        (1 until m).map(j =>
          max(when(col("_sj") === j, col("cid"))).as(s"_c$j")): _*)

  /** Per-subspace broadcastable ADC distance tables
    * (_qidj, _cidj, _dj) for the `queries` frame against `codebooks`
    * — the per-batch serving work: |Q|·k rows per subspace, computed
    * from the query vectors alone (the corpus is never touched).
    */
  def pqDistTables(queries: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, m: Int, subDim: Int): Seq[DataFrame] = {
    val dist = round(dot(col("_q"), col("_q")) -
      lit(2.0) * dot(col("_q"), col("_ce")) +
      dot(col("_ce"), col("_ce")), 6)
    val dtAll = materializeSmall(
      pqSubRows(queries, idCol, vecCol, m, subDim)
        .select(col("_sj"), col(idCol).as("_qid"), col("_e").as("_q"))
        .join(broadcast(codebooks), "_sj")
        .select(col("_sj"), col("_qid"), col("cid").as("_cid"),
          dist.as("_d")))
    (0 until m).map(j => dtAll.filter(col("_sj") === j)
      .select(col("_qid").as(s"_qid$j"), col("_cid").as(s"_cid$j"),
        col("_d").as(s"_d$j")))
  }

  /** [[assignEuclid]] with the subspace index as an extra key: one
    * broadcast join + one (sub, id)-keyed partial aggregate assigns
    * EVERY subspace in a single pass.
    */
  private def assignEuclidKeyed(base: DataFrame, cents: DataFrame,
      idCol: String): DataFrame = {
    val score = dot(col("_ce"), col("_ce")) -
      lit(2.0) * dot(col("_e"), col("_ce"))
    base.join(broadcast(cents), "_sj")
      .withColumn("_s", score)
      .groupBy(col("_sj"), col(idCol))
      .agg(min_by(struct(col("cid"), col("_e")),
        struct(col("_s"), col("cid"))).as("_best"))
      .select(col("_sj"), col(idCol), col("_best.cid").as("cid"),
        col("_best._e").as("_e"))
  }

  /** Fixed-order ADC sum + per-query ranking tail shared by the PQ
    * search variants. Expects `qid`, the id column and `_d0.._dm-1`.
    */
  private[ops] def pqRank(joined: DataFrame, idCol: String, m: Int,
      k: Int): DataFrame = {
    val adc = round((0 until m).map(j => col(s"_d$j")).reduce(_ + _), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("adc").asc, col(idCol).asc)
    joined
      .select(col("qid"), col(idCol), adc.as("adc"))
      .filter(col("qid") =!= col(idCol))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** Symmetric ("code-to-code") PQ distance tables: the per-subspace
    * k×k codeword-pair frames (_caj, _cbj, _dj) — size m·k²,
    * CORPUS-INDEPENDENT, so they broadcast however many vectors act
    * as queries. This is the shape that makes corpus-wide mining
    * (every vector a query at once) feasible where the per-query
    * asymmetric tables ([[pqDistTables]], |Q|·k rows) stop
    * broadcasting past a few thousand queries. The precision
    * tradeoff is the textbook SDC-vs-ADC gap: both endpoints
    * quantized, same rounding discipline as the ADC path.
    */
  def pqCodeDistTables(codebooks: DataFrame, m: Int): Seq[DataFrame] = {
    val d = round(dot(col("_ea"), col("_ea")) -
      lit(2.0) * dot(col("_ea"), col("_eb")) +
      dot(col("_eb"), col("_eb")), 6)
    (0 until m).map { j =>
      val a = codebooks.filter(col("_sj") === j)
        .select(col("cid").as(s"_ca$j"), col("_ce").as("_ea"))
      val b = codebooks.filter(col("_sj") === j)
        .select(col("cid").as(s"_cb$j"), col("_ce").as("_eb"))
      materializeSmall(a.crossJoin(b)
        .select(col(s"_ca$j"), col(s"_cb$j"), d.as(s"_d$j")))
    }
  }

  /** Hard-negative mining over a coded corpus — the metric-learning
    * data op: for EVERY vector, its `k` nearest same-coarse-cell
    * neighbors carrying a DIFFERENT label (close but wrong = the
    * negatives a contrastive trainer wants). All-pairs is confined
    * to each coarse cell (the IVF partitioning is the quadratic
    * blowup's bound — same-cell pairs only, never corpus²), and the
    * distance is symmetric-PQ: two code lookups and an add per pair
    * against the broadcast [[pqCodeDistTables]]. `codedWithCell` is
    * (idCol, _c0.._c{m-1}, cell) — [[AnnIndexStore]]'s codes table,
    * so mining runs entirely from the persisted index plus a label
    * join; the raw vectors are never touched.
    *
    * Skew caveat (the [[Dedup]] bucket-cap discipline applies): a
    * monster cell still pairs quadratically within itself — cap or
    * re-balance cells upstream if the coarse quantizer is badly
    * skewed. Emits (id, neg_id, dist, rank ≤ k), rank ties broken
    * (dist asc, neg_id asc).
    */
  def hardNegatives(codedWithCell: DataFrame, idCol: String,
      labels: DataFrame, labelCol: String, codebooks: DataFrame,
      m: Int, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val cds = pqCodeDistTables(codebooks, m)
    val base = codedWithCell.join(labels, idCol)
    def side(p: String) = base.select(
      col(idCol).as(s"${p}id") +: col(labelCol).as(s"${p}lb") +:
        col("cell").as(s"${p}cell") +:
        (0 until m).map(j => col(s"_c$j").as(s"${p}c$j")): _*)
    val pairs = side("_a").join(side("_b"),
      col("_acell") === col("_bcell") && col("_aid") =!= col("_bid") &&
        col("_alb") =!= col("_blb"))
    val joined = cds.zipWithIndex.foldLeft(pairs) {
      case (acc, (cd, j)) =>
        acc.join(broadcast(cd), acc(s"_ac$j") === cd(s"_ca$j") &&
          acc(s"_bc$j") === cd(s"_cb$j"))
    }
    val dist = round((0 until m).map(j => col(s"_d$j")).reduce(_ + _), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("dist").asc, col("neg_id").asc)
    joined
      .select(col("_aid").as("id"), col("_bid").as("neg_id"),
        dist.as("dist"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** Sign-LSH bucketed cosine: same contract as brute force but the
    * candidate set is restricted to the query's coarse cell.
    */
  def cosineBucketed(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, threshold: Double, bits: Int = 8): DataFrame = {
    val base = withNorm(emb, vecCol)
      .withColumn("_bkt", signBucket(col("_e"), bits))
      .select(col(idCol), col("_e"), col("_nrm"), col("_bkt"))
    val q = base.filter(queryPred)
      .select(col(idCol).as("qid"), col("_e").as("qe"),
        col("_nrm").as("qn"), col("_bkt").as("qbkt"))
    val cos = round(dot(col("qe"), col("_e")) / (col("qn") * col("_nrm")), 6)
    base.join(broadcast(q), col("_bkt") === col("qbkt") &&
        col("qid") =!= col(idCol))
      .select(col("qid"), col(idCol), cos.as("cos"))
      .filter(col("cos") >= threshold)
  }
}
