package graft.ops

/** ONE definition of the deterministic local store-directory scheme
  * the session-lifetime stores share ([[CurationStore.storeDirFor]],
  * [[AnnIndexStore.indexDirFor]], [[TextIndexStore.indexDirFor]]).
  * Sanitizing collapses punctuation runs, so distinct corpora
  * (/data/a-b vs /data/a/b) could alias one subdir and overwrite
  * each other's staged parquet — the short digest of the FULL path
  * keeps the name readable and the mapping injective.
  */
object StoreDirs {
  def dirFor(root: String, dataDir: String, suffix: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(dataDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map(b => f"$b%02x").mkString
    root + dataDir.replaceAll("[^A-Za-z0-9.]+", "_").stripPrefix("_") +
      s"-$digest$suffix"
  }
}
