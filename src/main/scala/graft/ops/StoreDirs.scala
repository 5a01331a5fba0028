package graft.ops

/** ONE definition of the deterministic local store-directory scheme
  * the session-lifetime stores share ([[CurationStore.storeDirFor]],
  * [[AnnIndexStore.indexDirFor]], [[TextIndexStore.indexDirFor]]).
  * Sanitizing collapses punctuation runs, so distinct corpora
  * (/data/a-b vs /data/a/b) could alias one subdir and overwrite
  * each other's staged parquet — the short digest of the FULL path
  * keeps the name readable and the mapping injective.
  *
  * The returned path is ABSOLUTE. This is load-bearing for the
  * bucketed stores: a catalog write's relative `path` option
  * resolves against the WAREHOUSE directory while the Hadoop Path
  * API resolves against the process working directory — a relative
  * store dir would scatter one store's stages across two roots (the
  * staged bucketed base landing under `spark-warehouse/` where the
  * stage swap never finds it, observed as a silently-empty table).
  */
object StoreDirs {
  def dirFor(root: String, dataDir: String, suffix: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(dataDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map(b => f"$b%02x").mkString
    val rel = root + dataDir.replaceAll("[^A-Za-z0-9.]+", "_")
      .stripPrefix("_") + s"-$digest$suffix"
    new java.io.File(rel).getAbsolutePath
  }

  /** Make a caller-supplied store path safe for CATALOG writes (the
    * warehouse-vs-cwd relative-resolution split in the class doc):
    * scheme-less relative paths absolutize against the process cwd —
    * matching what the Hadoop Path API would resolve them to — while
    * URIs and absolute paths pass through untouched. URI detection
    * matches any RFC-3986 scheme followed by a slash — Hadoop's
    * `Path.toString` emits SINGLE-slash scheme URIs (`file:/tmp/x`),
    * which a `"://"` substring test would misread as relative and
    * mangle into `/cwd/file:/tmp/x`.
    */
  private val SchemePrefix = "^[A-Za-z][A-Za-z0-9+.-]*:/".r

  def catalogSafe(path: String): String =
    if (path.startsWith("/") ||
        SchemePrefix.findPrefixOf(path).isDefined) path
    else new java.io.File(path).getAbsolutePath
}
