package graft.functions

import graft.SparkSpec
import graft.ops.{AnnIndexStore, Similarity}
import org.apache.spark.sql.functions._

/** Pins the zero-shuffle encode ([[NearestCosineCell]] /
  * [[NearestPqCode]] inside `AnnIndexStore.encodeTo`) to the
  * join+aggregate formulation it replaced: the stored codes must be
  * EXACTLY `assignCosineCells ⋈ pqEncode` over the same stored models
  * — including the adversarial rows the tie-breaks exist for
  * (duplicate centroid vectors → rounded-cos ties → smallest cid;
  * a zero-norm vector → all-NaN cos → the NaN ordering falls to the
  * id tie-break).
  */
class NearestCodeSpec extends SparkSpec {

  private def vec(seed: Int, dim: Int): Seq[Double] =
    (0 until dim).map(p =>
      math.round(math.sin(seed * 31 + p * 7) * 1000.0) / 100.0)

  test("fused encode == join+aggregate encode, ties and zero-norm included") {
    import spark.implicits._
    val dim = 8
    val rows = (0L until 60L).map { id =>
      val v =
        if (id == 7L) Seq.fill(dim)(0.0) // zero-norm: all-NaN cos
        // ids 20 and 30 are both centroids (pred: id % 10 == 0) with
        // IDENTICAL vectors — every row's rounded cos ties between
        // them, so the argmax must fall to the smaller cid
        else if (id == 30L) vec(20, dim)
        else vec(id.toInt, dim)
      (id, v)
    }
    val emb = rows.toDF("doc_id", "embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("nearest-code").toString
    val idx = AnnIndexStore.build(emb, "doc_id", "embedding", dir,
      centroidPred = col("doc_id") % 10 === 0,
      seedPred = col("doc_id") % 5 === 1, m = 2, subDim = 4, iters = 2)

    val snap = idx.pin(spark)
    val cents = spark.read.parquet(snap.centroidsPath)
    val cbs = spark.read.parquet(snap.codebooksPath)
    val expected = Similarity.pqEncode(emb, "doc_id", "embedding",
        cbs, m = 2, subDim = 4)
      .join(Similarity.assignCosineCells(emb, "doc_id", "embedding",
        cents).select(col("doc_id"), col("cell")), "doc_id")
      .select("doc_id", "_c0", "_c1", "cell")
    val actual = spark.read.parquet(snap.codesPath)
      .select("doc_id", "_c0", "_c1", "cell")

    assert(actual.count() === 60L)
    val onlyA = actual.exceptAll(expected).collect().toSeq
    val onlyE = expected.exceptAll(actual).collect().toSeq
    assert(onlyA.isEmpty && onlyE.isEmpty,
      s"fused encode diverged from the join+aggregate formulation\n" +
        s"only-actual:\n${onlyA.mkString("\n")}\n" +
        s"only-expected:\n${onlyE.mkString("\n")}")

    // the tie rows really exercised the tie-break: both duplicate
    // centroids exist, and every row assigned to that vector's cell
    // carries the SMALLER cid (20, never 30)
    assert(actual.filter(col("cell") === 30L).isEmpty)
    assert(!actual.filter(col("cell") === 20L).isEmpty)
    // the zero-norm row got a deterministic cell (the smallest cid,
    // by the NaN-tie ordering both formulations share)
    assert(actual.filter(col("doc_id") === 7L)
      .select("cell").head().getAs[Number](0).longValue === 0L)
  }

  test("model-literal row ceiling: over-ceiling build falls back to " +
      "the join path and encodes identical rows") {
    import spark.implicits._
    val dim = 8
    val rows = (0L until 60L).map { id =>
      val v =
        if (id == 7L) Seq.fill(dim)(0.0)
        else if (id == 30L) vec(20, dim)
        else vec(id.toInt, dim)
      (id, v)
    }
    val emb = rows.toDF("doc_id", "embedding")
    def buildAt(suffix: String) = AnnIndexStore.build(emb, "doc_id",
      "embedding",
      java.nio.file.Files.createTempDirectory(suffix).toString,
      centroidPred = col("doc_id") % 10 === 0,
      seedPred = col("doc_id") % 5 === 1, m = 2, subDim = 4, iters = 2)
    val lit = buildAt("nearest-lit") // default ceiling: literal path
    // ceiling of 1 row: every model table (6 centroids, 2·12-codeword
    // books here) exceeds it, so build/add/pqTrain ALL take the
    // broadcast-join fallback — the boundary case the size guard
    // exists for (r17 verdict item 3)
    spark.conf.set(Similarity.ModelLiteralMaxRows, "1")
    val joined =
      try buildAt("nearest-join")
      finally spark.conf.unset(Similarity.ModelLiteralMaxRows)
    val a = spark.read.parquet(lit.pin(spark).codesPath)
      .select("doc_id", "_c0", "_c1", "cell")
    val b = spark.read.parquet(joined.pin(spark).codesPath)
      .select("doc_id", "_c0", "_c1", "cell")
    assert(a.count() === 60L)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "over-ceiling fallback encode diverged from the literal path")
  }
}
