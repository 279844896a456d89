package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cache of persisted DataFrames keyed by (owning SparkSession, dir).
  * Module-level caches outlive sessions in long-lived JVMs, so frames
  * must never be handed to a session other than the one that built
  * them — and two concurrently live sessions over the same dir must
  * each keep their own frame (evicting the other session's entry on
  * every cross-session lookup would repeatedly unpersist a frame that
  * session may be using mid-job). Sessions are held weakly: when a
  * session is GC'd its entries drop out of the map; a session that is
  * merely STOPPED is purged (and its frames unpersisted) on the next
  * lookup. */
final class SessionCache {
  private val bySession =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.HashMap[String, DataFrame]]()

  def getOrBuild(spark: SparkSession, dir: String)(build: => DataFrame): DataFrame =
    synchronized {
      // purge entries of stopped sessions (their cached blocks are gone
      // with the context anyway; unpersist is best-effort)
      val it = bySession.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val s = e.getKey
        if (s != null && s.sparkContext.isStopped) {
          e.getValue.values.foreach(df =>
            try df.unpersist() catch { case _: Throwable => () })
          it.remove()
        }
      }
      val m = bySession.get(spark) match {
        case null =>
          val fresh = scala.collection.mutable.HashMap[String, DataFrame]()
          bySession.put(spark, fresh)
          fresh
        case existing => existing
      }
      m.getOrElseUpdate(dir, build)
    }

  def clearAll(): Unit = synchronized {
    bySession.values().forEach(m =>
      m.values.foreach(df => try df.unpersist() catch { case _: Throwable => () }))
    bySession.clear()
  }
}
