package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Test/probe-only access to the private[spark] listener bus so metric
  * probes (graft.tools.QMetrics) can drain queued events before reading
  * their counters. Not used by any production path.
  */
object ListenerShim {
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
