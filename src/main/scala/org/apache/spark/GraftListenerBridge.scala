package org.apache.spark

/** Listener-bus drain for graft's bench instrumentation.
  *
  * `SparkContext.listenerBus` is `private[spark]`; this shim (in the
  * spark package, the same pattern as the sql-package bridges) exposes
  * the one call the bench needs: blocking until every queued listener
  * event is delivered, so a job-counting listener read AFTER an action
  * returns reflects exactly that action's jobs — the bus is async, and
  * without the drain a count read immediately after `count()` races the
  * delivery thread.
  */
object GraftListenerBridge {
  def drainListenerBus(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
