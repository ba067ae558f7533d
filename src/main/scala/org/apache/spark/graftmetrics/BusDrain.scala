package org.apache.spark.graftmetrics

import org.apache.spark.SparkContext

/**
 * Access shim for the `private[spark]` listener bus: benchmark
 * harnesses that read task metrics through a SparkListener must wait
 * for the asynchronous event queue to drain before reading their
 * accumulators, or straggler task-end events are attributed to the
 * WRONG rep (the r13 sweep approximated this with fixed sleeps — a
 * race under load, and 2×150 ms of dead time per rep). `waitUntilEmpty`
 * is the exact synchronization point Spark's own test harnesses use;
 * it is `private[spark]`, hence this one-method shim in an
 * `org.apache.spark` subpackage.
 */
object BusDrain {
  /** Block until all queued listener events are dispatched (bounded:
    * a wedged queue times out rather than hanging the bench). */
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(30000)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
