package org.apache.spark

/** Bridge into `private[spark]` listener-bus draining: metrics listeners
  * are delivered asynchronously, so a measurement taken right after an
  * action may miss its final stage events; `drain` blocks until the bus
  * is empty (what Spark's own test harness does). */
package object graftlistener {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
