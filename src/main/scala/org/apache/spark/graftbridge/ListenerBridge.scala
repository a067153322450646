package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Minimal bridge into `private[spark] LiveListenerBus.waitUntilEmpty`
  * so the engine can drain the asynchronous listener bus before
  * reading listener-accumulated metrics. The streaming query listener
  * bus delivers `QueryProgressEvent`s through this bus on background
  * threads, so `awaitTermination` returning does NOT imply the final
  * micro-batch's progress event has reached registered listeners —
  * without a drain, an end-of-run metrics summary can undercount by
  * the last batch. Lives under the org.apache.spark namespace purely
  * for access scope; contains no Spark code.
  */
object ListenerBridge {

  /** Blocks until the listener bus queues are empty or the timeout
    * elapses; returns false on timeout (summary may be incomplete).
    */
  def drainListenerBus(sc: SparkContext, timeoutMillis: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMillis); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
