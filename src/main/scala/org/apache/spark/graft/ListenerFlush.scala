package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Tiny bridge into `private[spark]` listener-bus draining — the same
  * conventional extension-package pattern as `org.apache.spark.sql.graft`:
  * the bench's shuffle meter reads totals accumulated by an async
  * listener, so each measurement must drain the bus first or the
  * deltas bleed across queries. */
object ListenerFlush {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
