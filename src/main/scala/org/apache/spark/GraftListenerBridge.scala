package org.apache.spark

/** `SparkContext.listenerBus` is `private[spark]`; the dev instrumentation
  * (graft.DevStageMetrics) needs a synchronous drain so per-rep stage reads
  * neither miss a straggler `SparkListenerStageCompleted` nor leak it into
  * the next rep's buffer — a fixed sleep is a race, not a barrier.
  */
object GraftListenerBridge {
  def waitListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
