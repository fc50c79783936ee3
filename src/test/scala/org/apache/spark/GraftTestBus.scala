package org.apache.spark

/** Test-only shim: flush the shared listener bus so a spec can assert
  * on [[org.apache.spark.sql.util.QueryExecutionListener]] side effects
  * deterministically (`listenerBus` is `private[spark]`).
  */
object GraftTestBus {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
