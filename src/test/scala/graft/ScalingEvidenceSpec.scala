package graft

import org.scalatest.funsuite.AnyFunSuite

/** Evidence-regression net for the committed SCALING.jsonl artifact:
  * PlanBudgetSpec guards batch plan SHAPES; this guards the measured
  * TIERS. Each dev-run generator (graft.Scaling — untiered batch
  * rows, graft.StreamScaling — `tier:"streaming"`, graft.SkewScaling
  * — `tier:"skew"`, graft.StreamReplay — `tier:"streaming_replay"`,
  * graft.IncrementalScaling — `tier:"incremental"`,
  * graft.RewriteScaling — `tier:"rewrite"`,
  * graft.AsofScaling — `tier:"asof_hotkey"`,
  * graft.AnnIndexScaling — `tier:"ann_index"`)
  * owns a slice of the file and rewrites it with read-filter-rewrite;
  * round 9 silently lost the streaming rows in exactly that dance.
  * If a committed tier's rows vanish from a regeneration, `sbt test`
  * goes red instead of a verdict round noticing.
  */
class ScalingEvidenceSpec extends AnyFunSuite {

  private lazy val lines: Seq[String] = {
    val p = java.nio.file.Paths.get("SCALING.jsonl")
    assert(java.nio.file.Files.exists(p), s"missing artifact: $p")
    scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(p)).asScala.toSeq
      .filter(_.nonEmpty)
  }

  test("batch tier rows present (untiered graft.Scaling lines)") {
    val batch = lines.filterNot(_.contains("\"tier\":"))
    assert(batch.size >= 20,
      s"expected the batch scaling tier (>=20 rows), found ${batch.size}")
  }

  for ((tier, minRows) <- Seq("skew" -> 8, "streaming" -> 1,
      "streaming_replay" -> 8, "incremental" -> 12, "rewrite" -> 4,
      "asof_hotkey" -> 4, "ann_index" -> 16, "text_topk" -> 8,
      "advisor" -> 2, "snapshot" -> 6, "corpus_audit" -> 4)) {
    test(s"""tier "$tier" rows present (>= $minRows)""") {
      val n = lines.count(_.contains(s""""tier":"$tier","""))
      assert(n >= minRows,
        s"""SCALING.jsonl has $n rows with "tier":"$tier" — a """ +
          "generator regenerated the file and dropped the tier; " +
          "re-run the tier's main and re-commit")
    }
  }
}
