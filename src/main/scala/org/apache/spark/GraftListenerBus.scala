package org.apache.spark

/** Scala-visibility shim: `SparkContext.listenerBus` is `private[spark]`,
  * but draining the async listener bus is the only race-free way to read a
  * listener-maintained counter right after an action returns (ScaleBench's
  * per-batch job-count deltas — a job-start event can land AFTER the action
  * that spawned it). The method is public at the bytecode level; this file
  * lives in the `org.apache.spark` package solely to cross the Scala
  * package-private gate. Tools-only — nothing in the battery path uses it.
  */
object GraftListenerBus {

  /** Block until every queued listener event has been delivered, or
    * `timeoutMs` elapses. Returns true when drained, false on timeout. */
  def drain(sc: SparkContext, timeoutMs: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMs); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
