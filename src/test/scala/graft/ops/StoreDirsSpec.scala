package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** [[StoreDirs.catalogSafe]] must recognize every URI form a Hadoop
  * deployment hands it — the round-14 advice found that Hadoop's own
  * `Path.toString` emits SINGLE-slash scheme URIs (`file:/tmp/x`),
  * which a `"://"` substring test misreads as relative and mangles
  * into `/cwd/file:/tmp/x` (a silently different store location).
  */
class StoreDirsSpec extends AnyFunSuite {

  test("catalogSafe passes URIs and absolute paths through untouched " +
      "— including single-slash scheme URIs — and absolutizes only " +
      "genuinely relative paths") {
    assert(StoreDirs.catalogSafe("/tmp/x") == "/tmp/x")
    assert(StoreDirs.catalogSafe("hdfs://nn:8020/a/b") ==
      "hdfs://nn:8020/a/b")
    // the Path.toString form the advice flagged
    assert(StoreDirs.catalogSafe("file:/tmp/x") == "file:/tmp/x")
    assert(StoreDirs.catalogSafe("s3a://bucket/key") == "s3a://bucket/key")
    // a scheme per RFC 3986 can carry +, -, . and digits
    assert(StoreDirs.catalogSafe("abfss+v2://c@a/x") == "abfss+v2://c@a/x")
    val cwd = new java.io.File(".").getAbsoluteFile.getParentFile.toString
    assert(StoreDirs.catalogSafe("target/rel/store") ==
      s"$cwd/target/rel/store")
    // a WINDOWS-style or colon-bearing relative name without a slash
    // after the colon is NOT a URI — it still absolutizes
    assert(StoreDirs.catalogSafe("a:b/c") ==
      new java.io.File("a:b/c").getAbsolutePath)
  }

  test("dirFor stays injective across punctuation-collapsed aliases") {
    val a = StoreDirs.dirFor("target/t/", "/data/a-b", "")
    val b = StoreDirs.dirFor("target/t/", "/data/a/b", "")
    assert(a != b)
  }
}
