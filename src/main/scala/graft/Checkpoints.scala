package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Registry for `localCheckpoint` storage. `Dataset.localCheckpoint`
  * persists its internal RDD and nothing ever frees it —
  * `spark.catalog.clearCache()` only drops the RELATION cache, so
  * checkpoint blocks pinned by library operators (LSH candidate tables,
  * label-propagation rounds, contamination aggregates) would otherwise
  * accumulate across repeated library calls or bench runs.
  *
  * Operators checkpoint through [[local]]; iterative loops free superseded
  * rounds promptly with [[release]]; callers that want a clean slate
  * between queries (Bench, Verify, tests) call [[releaseAll]] alongside
  * `clearCache`.
  */
object Checkpoints {

  private val live = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]()

  private def backingRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.logical match {
      case lr: LogicalRDD => Some(lr.rdd)
      case _ => None
    }

  /** Eager local checkpoint whose backing blocks are registered for
    * release — the library-wide replacement for bare `localCheckpoint()`. */
  def local(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    backingRdd(cp).foreach(live.add)
    cp
  }

  /** Free one checkpointed DataFrame's pinned blocks immediately (loops
    * call this on round N−1 once round N is materialized, keeping resident
    * checkpoint storage constant instead of linear in iterations). */
  def release(df: DataFrame): Unit =
    backingRdd(df).foreach { r => r.unpersist(blocking = false); live.remove(r) }

  /** Free every checkpoint created via [[local]] that has not been
    * individually released — including the blocks backing returned
    * RESULTS, so call only once those results are fully consumed. */
  def releaseAll(): Unit = {
    var r = live.poll()
    while (r != null) { r.unpersist(blocking = false); r = live.poll() }
  }
}
