package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test run. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 4)
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  /** Raw table read. The brute-force specs treat `events.ts` as
    * epoch-nanos longs (the shape a TIMESTAMP(NANOS) corpus arrives
    * in under GraftSession's nanosAsLong); if the generator wrote a
    * native timestamp type instead, normalize to the same nanos-long
    * shape so every hand-rolled expectation stays generator-
    * independent (session tz = UTC, so the instant is identical).
    */
  def sf(name: String, dir: String = "/root/testdata/sf0.001") = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
        df.schema("ts").dataType != org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions
        .expr("unix_micros(cast(ts as timestamp)) * 1000"))
    else df
  }

  /** Order-insensitive frame comparison on stringized rows. */
  def assertSameRows(actual: org.apache.spark.sql.DataFrame,
      expected: Seq[Seq[Any]]): Unit = {
    val a = actual.collect().map(_.toSeq.map(v => String.valueOf(v))).toSeq
      .sortBy(_.mkString("|"))
    val e = expected.map(_.map(v => String.valueOf(v))).sortBy(_.mkString("|"))
    assert(a == e, s"\nactual:\n${a.map(_.mkString(", ")).mkString("\n")}" +
      s"\nexpected:\n${e.map(_.mkString(", ")).mkString("\n")}")
  }
}
