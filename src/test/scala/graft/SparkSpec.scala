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
    * epoch-nanos longs; EventTs normalizes whatever shape the
    * generator wrote to that one (see its scaladoc).
    */
  def sf(name: String, dir: String = "/root/testdata/sf0.001") = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") graft.queries.EventTs.toNanosLong(df) else df
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
