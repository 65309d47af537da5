package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `private[spark]` bridge (same pattern as `sql.graft.SparkShim`): the
  * listener bus delivers events asynchronously, so a metrics accumulator
  * fed by a SparkListener must drain the bus before being read/reset or
  * late stage-completion events are lost or attributed to the next
  * measurement window (`tools.ScaleRehearsal`). */
object ListenerShim {
  def drainListeners(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
