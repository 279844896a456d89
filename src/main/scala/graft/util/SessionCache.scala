package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cache of persisted DataFrames keyed by (owning SparkSession, dir).
  * Module-level caches outlive sessions in long-lived JVMs, so frames
  * must never be handed to a session other than the one that built
  * them — and two concurrently live sessions over the same dir must
  * each keep their own frame (evicting the other session's entry on
  * every cross-session lookup would repeatedly unpersist a frame that
  * session may be using mid-job). Entries of STOPPED sessions are
  * purged (and their frames unpersisted) on every lookup — a plain
  * map with an explicit liveness check, not a WeakHashMap: the cached
  * DataFrames strongly reference their owning session, so weak keys
  * could never be collected anyway. The residual is a session
  * abandoned without `stop()` whose entries live until the next lookup
  * or `clearAll()`; Spark sessions hold executors and UIs, so an
  * un-stopped session leaks far more than this map. */
final class SessionCache {
  private val bySession =
    scala.collection.mutable.HashMap[SparkSession, scala.collection.mutable.HashMap[String, DataFrame]]()

  def getOrBuild(spark: SparkSession, dir: String)(build: => DataFrame): DataFrame =
    synchronized {
      // purge entries of stopped sessions (their cached blocks are gone
      // with the context anyway; unpersist is best-effort)
      bySession.filterInPlace { (s, frames) =>
        val live = !s.sparkContext.isStopped
        if (!live) frames.values.foreach(df =>
          try df.unpersist() catch { case _: Throwable => () })
        live
      }
      bySession
        .getOrElseUpdate(spark, scala.collection.mutable.HashMap[String, DataFrame]())
        .getOrElseUpdate(dir, build)
    }

  /** Keep-latest-only eviction for VERSION-KEYED entries (ADVICE r20):
    * a serving session that interleaves refresh() and serve cycles
    * builds one persisted frame per table version under keys like
    * `prefix@version`; without eviction every superseded version's
    * frame — including corpus-sized shingle frames — stays persisted
    * until session stop. Callers that version their keys call this on
    * each lookup with the key they are about to use: every OTHER key
    * under the same prefix is unpersisted and dropped. */
  def evictPrefixExcept(spark: SparkSession, prefix: String,
      keep: String): Unit = synchronized {
    bySession.get(spark).foreach { frames =>
      val stale = frames.keys.filter(k => k.startsWith(prefix) && k != keep).toSeq
      stale.foreach { k =>
        frames.remove(k).foreach(df =>
          try df.unpersist() catch { case _: Throwable => () })
      }
    }
  }

  def clearAll(): Unit = synchronized {
    bySession.values.foreach(_.values.foreach(df =>
      try df.unpersist() catch { case _: Throwable => () }))
    bySession.clear()
  }
}
