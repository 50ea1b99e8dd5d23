package graft.sources

import graft.util.CacheRegistry
import org.apache.spark.sql.SparkSession

/** Durable persistence for the memoized landed-index family — the
  * cross-SESSION half of the amortization story: within a session the
  * incremental operators share their landed artifacts through
  * [[graft.util.CacheRegistry]]; a production deployment additionally
  * persists those artifacts between sessions (an ingest pipeline
  * restarts daily; the landed corpus — and therefore every landed
  * index — did not change), paying the index build once per landed
  * COMPACTION instead of once per session.
  *
  * Mechanics: [[saveAll]] writes every live registry entry to
  * `dir/<md5(key)>.parquet` plus a `manifest` file mapping the hash
  * back to the full registry key; [[restoreAll]] reads the manifest
  * and seeds the registry with parquet-backed frames under the exact
  * saved keys. Because a registry key embeds the producing operator's
  * parameters AND the canonical semantic hash of its input plan, a
  * new session that constructs the same landed frame (same files,
  * same filters) computes the same key and transparently hits the
  * restored entry — no operator changes, no recomputation; a session
  * whose landed corpus CHANGED computes a different semantic hash and
  * falls through to a fresh build, so a stale index can never serve
  * the wrong corpus.
  *
  * At 100 TB the indexes are the small side (narrow per-doc/per-vector
  * projections, codebooks, count tables, boundary rows); writing them
  * as parquet is exactly how a cluster would stage them between runs. */
object IndexStore {

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Persist every live [[CacheRegistry]] entry under `dir`. Returns
    * the number of entries written. Call after an index-build phase
    * ([[graft.SparkEntry.buildIndexes]]-style) has populated the
    * registry. */
  def saveAll(dir: String): Int = {
    val entries = CacheRegistry.entries
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    entries.foreach { case (k, df) =>
      df.write.mode("overwrite").parquet(s"$dir/${md5(k)}.parquet")
    }
    val manifest = entries.keys.toSeq.sorted
      .map(k => s"${md5(k)}\t$k").mkString("", "\n", "\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/manifest"),
      manifest.getBytes("UTF-8"))
    entries.size
  }

  /** Seed the registry from a [[saveAll]] directory. Returns the
    * number of entries restored. Existing live entries win (seed is
    * getOrElseUpdate), so restoring into a warm session never
    * clobbers fresher builds. */
  def restoreAll(spark: SparkSession, dir: String): Int = {
    val path = java.nio.file.Paths.get(s"$dir/manifest")
    if (!java.nio.file.Files.exists(path)) 0
    else {
      val lines = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
        .split("\n").toSeq.filter(_.nonEmpty)
      lines.foreach { line =>
        val Array(h, k) = line.split("\t", 2)
        CacheRegistry.seed(k, spark.read.parquet(s"$dir/$h.parquet"))
        ()
      }
      lines.size
    }
  }
}
