package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Scoped registry for operator-internal caches.
  *
  * Operators like [[graft.operators.Dedup]] cache a shared intermediate
  * (the shingle set) so it computes once instead of once per join consumer
  * — but a bare `.cache()` lives in the CacheManager until the session
  * dies, which leaks executor memory in a long-lived pipeline and spams
  * "already cached" warnings when query shapes overlap. Registering
  * through `cached` keeps the plan's statistics (so broadcast decisions
  * are unaffected, unlike a localCheckpoint) and lets the harness free
  * everything between queries with one `release()`.
  *
  * `cached` is idempotent: a plan the CacheManager already tracks is not
  * re-registered, which silences the duplicate-cache warning path.
  */
object CacheScope {
  private val registry = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  def cached(df: DataFrame): DataFrame = synchronized {
    if (df.storageLevel == StorageLevel.NONE) {
      df.cache()
      registry += df
    }
    df
  }

  /** Unpersist every registered cache (non-blocking) — call at operator/
    * query exit. Safe to call with queries still defined: consumers simply
    * recompute. */
  def release(): Unit = synchronized {
    registry.foreach(_.unpersist(blocking = false))
    registry.clear()
  }
}
