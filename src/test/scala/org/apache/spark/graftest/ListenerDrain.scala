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

/** Test-only bridge to the `private[spark]` checkpoint-dir var: the
  * public API can SET a checkpoint directory but never unset it, and the
  * reliable-checkpoint test must restore the shared session to its
  * local-checkpoint default or every later iterative-operator test pays
  * checkpoint-file I/O.
  */
object CheckpointDirs {
  def reset(sc: SparkContext): Unit = sc.checkpointDir = None
}
