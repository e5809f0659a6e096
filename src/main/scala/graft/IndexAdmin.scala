package graft

import org.apache.spark.sql.SparkSession

import graft.operators.IndexFamily

/** Operator tool for a CRASHED maintenance run (round-14 verdict task 7)
  * — the executable form of the recovery procedure the lease doc only
  * described: a maintenance op that died mid-flight leaves its
  * `.maintenance` lease held (deliberately — auto-expiry would reintroduce
  * the lost-append race), plus whatever swap residue marks how far it got.
  * A WRONG manual cleanup (deleting the lease without repairing residue)
  * reopens exactly that race, so the inspection and the repair ship as one
  * tool:
  *
  * {{{
  *   # dry-run: classify the residue, print the repair plan, change nothing
  *   tools/run_class.sh graft.IndexAdmin /path/to/table.parquet
  *   # execute: repair torn residue, then release the lease
  *   tools/run_class.sh graft.IndexAdmin /path/to/table.parquet --release
  * }}}
  *
  * Residue classes it reports (and `--release` repairs):
  *  - CLEAN — lease only, no residue: the crash happened before any swap
  *    started; release is safe as-is.
  *  - STAGED — a `.rewrite` staging dir exists but every live partition is
  *    in place: the rewrite staged but never swapped; the staging is
  *    discarded (its content is re-derived by the retried merge).
  *  - PARKED — one or more `_p=K.old` parks exist: the crash hit between a
  *    partition swap's renames; orphaned parks are promoted back, shadowed
  *    parks dropped ([[IndexFamily.repairTorn]]'s contract).
  *  - MIGRATING — a `.parts.next` intent marker exists: a
  *    [[IndexFamily.repartitionState]] tore; rolled forward or back from
  *    the surviving siblings ([[IndexFamily.repairMigration]]'s decision
  *    table).
  *  - TXN (cross-table, round-15) — a `.txn` intent marker on a cluster
  *    state: the labels landed but the member projection didn't;
  *    `--release` rebuilds `members.parquet` wholesale from the
  *    authoritative labels ([[graft.operators.Dedup.repairClusterStateTxn]])
  *    instead of leaving the repair pending for the next increment.
  */
object IndexAdmin {

  /** Inspect (and with `release`, repair + unlock) one table. Returns the
    * report text — the main prints it, specs assert on it. */
  def run(s: SparkSession, tablePath: String, release: Boolean): String = {
    val fs = new org.apache.hadoop.fs.Path(tablePath)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def p(x: String) = new org.apache.hadoop.fs.Path(x)
    val sb = new StringBuilder
    sb ++= s"[index-admin] table: $tablePath\n"
    val leaseHeld = fs.exists(p(IndexFamily.leasePath(tablePath)))
    sb ++= s"[index-admin] lease: ${if (leaseHeld) "HELD (crashed or live maintenance)" else "free"}\n"

    // every residue name comes from IndexFamily's own path builders — a
    // re-spelled convention here would make the classifier report CLEAN
    // on a dirty table and the released lease would reopen the race
    val staging = fs.exists(p(IndexFamily.rewriteStagingPath(tablePath)))
    val migrating = fs.exists(p(IndexFamily.partsNextPath(tablePath)))
    val parkedDir = fs.exists(p(IndexFamily.oldDirPath(tablePath)))
    val parks: Seq[String] = IndexFamily.parkedPartitionNames(s, tablePath)
    val txn = fs.exists(p(IndexFamily.txnMarkerPath(tablePath)))

    val state =
      if (migrating) "MIGRATING (torn repartitionState — .parts.next intent marker)"
      else if (parks.nonEmpty) s"PARKED (${parks.size} torn partition swap(s): ${parks.mkString(", ")})"
      else if (staging) "STAGED (a .rewrite staging dir, no swap started)"
      else "CLEAN (no residue)"
    sb ++= s"[index-admin] residue: $state\n"
    if (parkedDir && !migrating)
      sb ++= s"[index-admin] WARNING: $tablePath.olddir exists without a migration marker — inspect manually\n"
    if (txn && !release)
      sb ++= s"[index-admin] note: $tablePath.txn cross-table marker present — " +
        "--release rebuilds the member projection from these labels (or the " +
        "next clusterIncrement/delete does it lazily)\n"

    if (!release) {
      sb ++= "[index-admin] dry-run: no changes made. Re-run with --release to " +
        (if (migrating) "roll the migration forward/back and release the lease"
         else if (parks.nonEmpty || staging) "repair the residue and release the lease"
         else "release the lease")
    } else {
      if (migrating) {
        val action = IndexFamily.repairMigration(s, tablePath)
        sb ++= s"[index-admin] migration repair: $action\n"
      } else if (parks.nonEmpty || staging) {
        IndexFamily.repairTorn(s, tablePath)
        sb ++= s"[index-admin] repaired: parks restored/dropped, staging discarded\n"
      }
      if (txn) {
        // the torn two-table commit (labels landed, member projection
        // stale): finish it here instead of waiting for the next
        // increment — an operator releasing a crashed table should hand
        // back a CONSISTENT table, not one with a pending lazy repair
        val indexDir = p(tablePath).getParent.toString
        graft.operators.Dedup.repairClusterStateTxn(s, indexDir)
        sb ++= "[index-admin] txn repair: member projection rebuilt from the " +
          "authoritative labels; marker dropped\n"
      }
      if (leaseHeld) {
        IndexFamily.releaseLease(s, tablePath)
        sb ++= "[index-admin] lease released\n"
      }
      sb ++= "[index-admin] table is consistent; retried increments/merges may proceed"
    }
    sb.result()
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: graft.IndexAdmin <tablePath> [--release]")
    val tablePath = args(0)
    val release = args.length > 1 && args(1) == "--release"
    val s = SparkSession.builder()
      .appName("graft-index-admin")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try println(run(s, tablePath, release))
    finally s.stop()
  }
}
