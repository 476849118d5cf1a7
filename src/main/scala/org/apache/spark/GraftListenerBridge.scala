package org.apache.spark

/** `private[spark]`-access bridge for the Audit tool: block until the
  * async listener bus has delivered every queued event, so per-query
  * job/stage/task counters read complete totals (same pattern Spark's
  * own test utilities use via `sc.listenerBus.waitUntilEmpty`).
  */
object GraftListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
