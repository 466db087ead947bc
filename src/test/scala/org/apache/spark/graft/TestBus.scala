package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge: QueryExecutionListener events ride the shared
  * async listener bus; draining it makes observed-metric assertions
  * deterministic. (`listenerBus` is private[spark].) */
object TestBus {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
