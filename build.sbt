ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "arkinvestapirustdataspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// ---- Parallel forked test groups ----
// One JVM serialized 56 suites at ~26 min wall (measured -oD run,
// 2026-08-19: 1484 s of test time, top suites PlanBudgetSpec 241 s,
// CurationStoreSpec 187 s, CorpusStoreSpec 132 s, ...). The suites
// are independent — every fixture lives in a per-suite temp dir or a
// per-test store dir — EXCEPT the session catalog's warehouse
// directory (saveAsTable for the bucketed-layout fixtures), which is
// cwd-shared across JVMs; each group below therefore forks its own
// JVM with its own Spark session AND its own warehouse dir. Groups
// are balanced by those measured durations so the wall is the
// heaviest group (~4 min), not the sum. Suites keep their intra-suite
// order and single-writer semantics (no suite is split).
val testGroupOf: String => Int = {
  val explicit = Map(
    "graft.PlanBudgetSpec" -> 0,
    "graft.ops.CurationStoreSpec" -> 1, "graft.queries.PlanSpec" -> 1,
    "graft.ops.CorpusStoreSpec" -> 2, "graft.ops.QuarantineSpec" -> 2,
    "graft.ops.GatedFoldSpec" -> 2, "graft.ops.UnpersistSpec" -> 2,
    "graft.ops.TextIndexStoreSpec" -> 3, "graft.ops.FlipCountSpec" -> 3,
    "graft.ops.AnnIndexStoreSpec" -> 4,
    "graft.ops.SnapshotIsolationSpec" -> 4,
    "graft.ops.StatsStoreSpec" -> 4,
    "graft.ops.OpsSpec" -> 5, "graft.streaming.EventStreamSpec" -> 5,
    "graft.ops.AdvisorSpec" -> 5,
  )
  name => explicit.getOrElse(name, 6)
}
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  (Test / definedTests).value.groupBy(t => testGroupOf(t.name)).toSeq
    .sortBy(_._1).map { case (g, ts) =>
      Tests.Group(s"g$g", ts, Tests.SubProcess(ForkOptions()
        .withRunJVMOptions(opts :+
          s"-Dspark.sql.warehouse.dir=/tmp/graft-test-wh-g$g")))
    }
}
// sbt's default restrictions pin ForkedTestGroup to 1 (sequential
// groups); lift it so the groups actually overlap. limitAll bounds
// every other task kind as before.
Global / concurrentRestrictions := Seq(
  Tags.limitAll(16), Tags.limit(Tags.ForkedTestGroup, 8))
