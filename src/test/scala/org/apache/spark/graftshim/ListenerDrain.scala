package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Test-only: block until the listener bus has delivered all queued events.
  * QueryExecutionListener callbacks are asynchronous (they ride the shared
  * LiveListenerBus), so asserting on plans collected by a listener without
  * draining first races the bus. `listenerBus` is private[spark] — hence
  * this one-line shim in the org.apache.spark namespace.
  */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
