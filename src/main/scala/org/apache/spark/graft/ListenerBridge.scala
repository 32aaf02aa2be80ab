package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into `private[spark] SparkContext#listenerBus`: scale
  * measurement (graft.ScaleBench) reads per-stage shuffle/input bytes
  * from a SparkListener, and must DRAIN the async listener bus before
  * reading its counters — otherwise the last stages' metrics race the
  * read. Same pattern as [[org.apache.spark.sql.graft.ColumnBridge]]:
  * lives in the spark package namespace solely to cross the access
  * boundary, modifies nothing. */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
