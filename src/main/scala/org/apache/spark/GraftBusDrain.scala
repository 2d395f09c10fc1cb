package org.apache.spark

/** Engine-internal shim (used by graft.Profile and the test suites): `LiveListenerBus.waitUntilEmpty` is `private[spark]`,
  * but deterministic listener-based metrics (ScalingSpec's shuffle-row
  * tally) need to drain the bus before reading the tally — a sleep would
  * be the flaky alternative. */
object GraftBusDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
