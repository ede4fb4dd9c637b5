package org.apache.spark

/** Test-only bridge: `SparkContext.listenerBus` is `private[spark]`, so a
  * spec that counts jobs via a SparkListener needs this to drain in-flight
  * events before asserting (listener delivery is async). */
object GraftTestBus {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
