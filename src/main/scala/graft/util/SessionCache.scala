package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dir-keyed cache of persisted DataFrames that revalidates the OWNING
  * SparkSession on every lookup: a frame built by a session that has
  * since stopped (or by a different concurrent session) is unpersisted
  * and rebuilt for the caller's session instead of handed out dead —
  * module-level caches outlive sessions in long-lived JVMs. */
final class SessionCache {
  private val m = scala.collection.mutable.HashMap[String, DataFrame]()

  def getOrBuild(spark: SparkSession, dir: String)(build: => DataFrame): DataFrame =
    synchronized {
      m.get(dir) match {
        case Some(df) if (df.sparkSession eq spark) && !spark.sparkContext.isStopped =>
          df
        case stale =>
          stale.foreach(df => try df.unpersist() catch { case _: Throwable => () })
          val df = build
          m.put(dir, df)
          df
      }
    }

  def clearAll(): Unit = synchronized {
    m.values.foreach(df => try df.unpersist() catch { case _: Throwable => () })
    m.clear()
  }
}
