package graft.util

import org.apache.spark.sql.DataFrame
import scala.collection.concurrent.TrieMap

/** Session-scoped registry of persisted shared sub-plans.
  *
  * Operators that feed several DAG branches (the shingle table under both
  * the n-gram-Jaccard and minhash paths, the banded LSH table under both
  * sides of a self-join) persist through here instead of calling
  * `.persist()` inline, which fixes two round-2 review findings at once:
  *
  *  - the same sub-plan built twice by two operators in one session
  *    (q18 and q19 each re-shingling the corpus) now hits the registry
  *    and is computed once;
  *  - `persist()` leaks in long-lived sessions: nothing ever unpersisted.
  *    A pipeline (or the bench harness) calls [[releaseAll]] between
  *    corpora.
  *
  * Keys embed the producing operator's parameters plus the *semantic* hash
  * of the input plan, so two differently-built DataFrames over the same
  * source share an entry only when Catalyst considers them equivalent.
  */
object CacheRegistry {
  private val items = TrieMap.empty[String, DataFrame]

  def key(df: DataFrame, parts: Any*): String =
    parts.mkString(":") + ":" + df.queryExecution.analyzed.semanticHash()

  def cache(k: String, build: => DataFrame): DataFrame =
    items.getOrElseUpdate(k, build.persist())

  /** Seed an entry with an ALREADY-MATERIALIZED frame (e.g. a parquet
    * read of a persisted index — [[graft.sources.IndexStore]]): the
    * next [[cache]] call under the same key returns it instead of
    * rebuilding. The seeded frame is persisted like a built one so
    * repeat consumers don't re-scan the files. */
  def seed(k: String, df: DataFrame): DataFrame = cache(k, df)

  /** Snapshot of the live entries — [[graft.sources.IndexStore]]'s
    * save face iterates this. */
  def entries: Map[String, DataFrame] = items.toMap

  def releaseAll(): Unit = {
    items.values.foreach(_.unpersist(blocking = false))
    items.clear()
  }

  /** Release every entry whose kind (the first `:`-separated key part,
    * e.g. "shingles", "minhash-bands", "dedup-clusters") is NOT in
    * `retainKinds`. Returns the number of entries released — lets a
    * harness decide whether a GC pass is owed. */
  def releaseExcept(retainKinds: Set[String]): Int = {
    val victims = items.keySet.filter(k => !retainKinds.contains(k.takeWhile(_ != ':')))
    victims.foreach { k =>
      items.remove(k).foreach(_.unpersist(blocking = false))
    }
    victims.size
  }

  def size: Int = items.size
}
