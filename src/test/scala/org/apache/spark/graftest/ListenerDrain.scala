package org.apache.spark.graftest

import org.apache.spark.SparkContext

/** Test-only bridge to the `private[spark]` listener bus: metric
  * assertions must flush asynchronously-delivered task-end events before
  * reading their accumulators, or counts race the bus. Lives under
  * `org.apache.spark` (test scope only) for access; nothing in main
  * sources uses it.
  */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
