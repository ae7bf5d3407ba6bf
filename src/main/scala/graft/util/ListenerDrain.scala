package graft.util

import org.apache.spark.sql.SparkSession

/** Drain Spark's async listener bus — used by metrics-attribution
  * tooling (ProfileScratch) that reads listener-fed aggregates right
  * after a job: stage-completed events post asynchronously, so reading
  * without a drain under-attributes GC/spill on a loaded box (a fixed
  * sleep is a race, not a fix).
  *
  * `LiveListenerBus.waitUntilEmpty` is `private[spark]` but JVM-public
  * (Scala package-private compiles to a public method), so it is
  * reached reflectively. Returns true when the bus was drained; false
  * means the API moved and the caller should fall back to a bounded
  * sleep.
  */
object ListenerDrain {

  def drain(spark: SparkSession, timeoutMs: Long = 10000L): Boolean =
    try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty", classOf[Long])
        .invoke(bus, java.lang.Long.valueOf(timeoutMs))
      true
    } catch { case _: Exception => false }
}
