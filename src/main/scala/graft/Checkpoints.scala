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

  // WEAK keys (identity-keyed: RDD does not override equals): the registry
  // must not extend a checkpoint RDD's lifetime. A library caller that
  // drops a returned DataFrame without release/releaseAll would otherwise
  // leak the pinned blocks forever — a strong ref here also defeats
  // ContextCleaner's GC-driven unpersist safety net that a bare
  // `localCheckpoint()` still had. With weak keys the entry vanishes when
  // the RDD becomes unreachable and ContextCleaner frees the blocks.
  private val live = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.rdd.RDD[_], java.lang.Boolean]())

  private def backingRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.logical match {
      case lr: LogicalRDD => Some(lr.rdd)
      case _ => None
    }

  // innermost active [[scoped]] collector for the calling thread (null
  // when no scope is open) — foreachBatch bodies run their whole batch on
  // one microbatch thread, so thread-locality is exactly batch-locality
  private val activeScope =
    new ThreadLocal[scala.collection.mutable.ArrayBuffer[org.apache.spark.rdd.RDD[_]]]()

  /** Eager local checkpoint whose backing blocks are registered for
    * release — the library-wide replacement for bare `localCheckpoint()`. */
  def local(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    backingRdd(cp).foreach { r =>
      live.put(r, java.lang.Boolean.TRUE)
      val sc = activeScope.get()
      if (sc != null) sc += r
    }
    cp
  }

  /** Run `body` in a checkpoint SCOPE: every checkpoint it creates (on
    * this thread) is released when the scope closes — the long-running
    * stream legs' batch hygiene (round-14 verdict task 3). A foreachBatch
    * body wraps itself in one scope per micro-batch: without it, each
    * batch's candidate tables / signature checkpoints stay pinned until a
    * GC happens to collect the dead DataFrames, and a deployment-length
    * stream accumulates storage across thousands of batches. The scope is
    * only safe where the body FULLY CONSUMES everything it returns (a
    * foreachBatch body does — its sink write is the consumption); do not
    * wrap code that hands checkpointed frames to a later consumer. Nested
    * scopes release independently (inner checkpoints at inner close). */
  def scoped[A](body: => A): A = {
    val outer = activeScope.get()
    val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.rdd.RDD[_]]
    activeScope.set(buf)
    try body finally {
      activeScope.set(outer)
      buf.foreach { r => r.unpersist(blocking = false); live.remove(r) }
    }
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
    // iterating a synchronizedMap view requires holding the wrapper's lock;
    // unpersist outside it (it can block on the block manager)
    val snapshot = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.rdd.RDD[_]]
      live.synchronized {
        live.keySet.forEach(r => if (r != null) buf += r)
        live.clear()
      }
      buf
    }
    snapshot.foreach(_.unpersist(blocking = false))
  }
}
