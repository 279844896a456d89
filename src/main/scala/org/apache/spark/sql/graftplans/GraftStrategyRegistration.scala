package org.apache.spark.sql.graftplans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy

/** Idempotent, thread-safe self-registration of the whole-operator
  * planning strategies on `spark.experimental.extraStrategies` — the
  * fallback path for sessions built WITHOUT
  * `spark.sql.extensions=graft.GraftExtensions`. The contains/append
  * pair is not atomic on the mutable experimental list; two threads
  * building the first graft DataFrame concurrently could lose a
  * registration (opaque planner assertion later) or double-register.
  * One global lock around the read-modify-write closes both. */
object GraftStrategyRegistration {
  private val lock = new Object

  def ensure(spark: SparkSession, strategy: SparkStrategy): Unit = lock.synchronized {
    if (!spark.experimental.extraStrategies.contains(strategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ strategy
    }
  }
}
