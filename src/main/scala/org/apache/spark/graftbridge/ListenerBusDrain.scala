package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge to `SparkContext.listenerBus.waitUntilEmpty()` — private[spark],
  * so this one-liner lives under the org.apache.spark package tree.
  *
  * Why it exists: Bench's per-query CPU accounting snapshots a
  * SparkListener accumulator between queries, and the listener bus is
  * async. A heuristic "quiet for 50 ms, cap 500 ms" drain looked safe —
  * the bus normally lags sub-millisecond — but the first storm-window
  * measurement proved the cap real: under co-tenant load 17+ the bus's
  * single dispatch thread falls thousands of task-end events behind,
  * the cap expired mid-backlog, and a heavyweight query's WARMUP CPU
  * leaked into its timed window (q_hits read cpu/wall = 39x on a
  * 32-thread pool — arithmetically impossible for a clean window).
  * waitUntilEmpty() is exact: every posted event is dispatched before
  * it returns, at any load.
  */
object ListenerBusDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
