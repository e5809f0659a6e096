package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, IndexFamily}

/** Laws of the shared index-family core (round-13 verdict tasks 1, 3, 5,
  * 7): the partition-scoped state merge touches ONLY the partitions a
  * key hashes into (untouched partition files stay byte-identical), the
  * maintenance lease makes the append-vs-rewrite race refuse loudly, and
  * torn partition swaps are restored before the next merge. */
class IndexFamilySpec extends AnyFunSuite with SparkTestBase {

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"ixfam-$tag-").toString

  private def fileSig(path: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(path)).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> (f.length(), f.lastModified())).toMap
  }

  private def stateRows(path: String): Set[(Long, Long)] =
    IndexFamily.readSnapshot(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("mergeTouched rewrites only partitions holding touched or new keys; others stay byte-identical") {
    import spark.implicits._
    val dir = tmpDir("merge")
    val path = s"$dir/state.parquet"
    val nParts = 8
    // keys 0..199: key k in partition k % 8
    val base = (0L until 200L).map(k => (k, k * 10))
    IndexFamily.writePartitioned(base.toDF("key", "value"), path, "key", nParts)
    val sigBefore = fileSig(path)
    // touch only keys in partitions {3, 5}: replace key 3 and add key 1003
    // (1003 % 8 == 3), plus drop key 5 (touched, not re-emitted)
    val touched = Seq(3L, 5L).toDF("key")
    val fresh = Seq((3L, 999L), (1003L, 42L)).toDF("key", "value")
    val affected = IndexFamily.mergeTouched(spark, path, "key", touched, fresh)
    assert(affected == 2, s"keys {3, 5, 1003} hash into partitions {3, 5}; got $affected")
    val sigAfter = fileSig(path)
    (0 until nParts).filterNot(Set(3, 5)).foreach { p =>
      val before = sigBefore.filter(_._1.contains(s"_p=$p/"))
      val after = sigAfter.filter(_._1.contains(s"_p=$p/"))
      assert(before == after, s"untouched partition $p changed: $before vs $after")
    }
    assert(sigAfter.keys.exists(_.contains("_p=3/")) &&
      sigBefore.filter(_._1.contains("_p=3/")) != sigAfter.filter(_._1.contains("_p=3/")),
      "touched partition 3 must be rewritten")
    val expected = base.filterNot(r => r._1 == 3L || r._1 == 5L).toSet +
      ((3L, 999L)) + ((1003L, 42L))
    assert(stateRows(path) == expected)
  }

  test("mergeTouched content law == full untouched-union-merged rewrite (negative keys included)") {
    import spark.implicits._
    val dir = tmpDir("neg")
    val path = s"$dir/state.parquet"
    // negative keys — the span family's 64-bit hashes; pmod must place them
    val base = Seq((-17L, 1L), (-9L, 2L), (4L, 3L), (12L, 4L), (-1L, 5L))
    IndexFamily.writePartitioned(base.toDF("key", "value"), path, "key", 4)
    IndexFamily.mergeTouched(spark, path, "key",
      Seq(-17L, 12L).toDF("key"), Seq((-17L, 100L), (-33L, 7L)).toDF("key", "value"))
    assert(stateRows(path) ==
      Set((-9L, 2L), (4L, 3L), (-1L, 5L), (-17L, 100L), (-33L, 7L)))
  }

  test("an orphaned .old partition (torn swap) is restored before the next merge and by snapshot reads") {
    import spark.implicits._
    val dir = tmpDir("torn")
    val path = s"$dir/state.parquet"
    IndexFamily.writePartitioned(
      (0L until 40L).map(k => (k, k)).toDF("key", "value"), path, "key", 4)
    // simulate a crash between a swap's two renames: partition 2 parked,
    // live dir gone
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$path/_p=2"),
      new org.apache.hadoop.fs.Path(s"$path/_p=2.old")))
    // snapshot reads serve the parked generation (no data loss)
    assert(stateRows(path).size == 40)
    // the next merge restores the park, then applies
    IndexFamily.mergeTouched(spark, path, "key",
      Seq(2L).toDF("key"), Seq((2L, 777L)).toDF("key", "value"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/_p=2.old")))
    assert(stateRows(path).contains((2L, 777L)) && stateRows(path).size == 40)
  }

  test("maintenance lease: appends refuse while held, work after release; double-acquire refuses") {
    import spark.implicits._
    val dir = tmpDir("lease")
    val path = s"$dir/t.parquet"
    Seq((1L, 1L)).toDF("a", "b").write.parquet(path)
    IndexFamily.acquireLease(spark, path)
    val e = intercept[IllegalArgumentException] {
      IndexFamily.requireNoLease(spark, path, "testAppend")
    }
    assert(e.getMessage.contains("maintenance"))
    val e2 = intercept[IllegalArgumentException] {
      IndexFamily.acquireLease(spark, path)
    }
    assert(e2.getMessage.contains("maintenance"))
    IndexFamily.releaseLease(spark, path)
    IndexFamily.requireNoLease(spark, path, "testAppend") // no throw
  }

  test("increment append refuses while the index table is under maintenance (end-to-end)") {
    val split = Dedup.incrementSplitAt(spark, sf)
    val idx = tmpDir("lease-e2e")
    Dedup.buildMinhashIndex(spark,
      Tables(spark, sf, "documents").filter(col("doc_id") < split), idx, s"$idx#b")
    IndexFamily.acquireLease(spark, s"$idx/signatures.parquet")
    try {
      val e = intercept[IllegalArgumentException] {
        Dedup.dedupIncrement(spark,
          Tables(spark, sf, "documents").filter(col("doc_id") >= split),
          idx, s"$idx#n", append = true)
      }
      assert(e.getMessage.contains("maintenance"))
    } finally IndexFamily.releaseLease(spark, s"$idx/signatures.parquet")
    // probe-only calls (append = false) are unaffected by the lease
    IndexFamily.acquireLease(spark, s"$idx/signatures.parquet")
    try {
      assert(Dedup.dedupIncrement(spark,
        Tables(spark, sf, "documents").filter(col("doc_id") >= split),
        idx, s"$idx#ro", append = false).count() >= 0)
    } finally IndexFamily.releaseLease(spark, s"$idx/signatures.parquet")
  }

  test("id watermark: seeded by scan, advanced before append (crash-safe-high), reset on rebuild") {
    import spark.implicits._
    val dir = tmpDir("wm")
    val path = s"$dir/t.parquet"
    (1L to 10L).map(i => (i, i)).toDF("doc_id", "v").write.parquet(path)
    // first use seeds from a max() scan of the stored ids
    assert(IndexFamily.idWatermark(spark, path, "doc_id") == 10L)
    // the ordering guard advances the watermark BEFORE the caller appends:
    // simulate a crash AFTER the guard passed but BEFORE the append landed
    IndexFamily.requireIdsAbove(spark, path, "doc_id",
      Seq(11L, 12L).toDF("doc_id"), 11L, 12L, "wmSpec")
    // nothing was appended, but the watermark is already 12 — the SAFE
    // direction: the retried/next batch must start above the crashed one
    assert(IndexFamily.idWatermark(spark, path, "doc_id") == 12L)
    val e = intercept[IllegalArgumentException] {
      IndexFamily.requireIdsAbove(spark, path, "doc_id",
        Seq(12L).toDF("doc_id"), 12L, 12L, "wmSpec")
    }
    assert(e.getMessage.contains("id watermark"))
    // a rebuild at the same path resets the file; next use re-seeds by scan
    IndexFamily.resetIdWatermark(spark, path)
    assert(IndexFamily.idWatermark(spark, path, "doc_id") == 10L)
    // the stream path tolerates ONLY a proven torn redelivery: ids 1-3 are
    // all already stored (replay) -> warn and proceed; a batch mixing a
    // stored id with an ABSENT one (1, 11) is a genuinely out-of-order
    // fresh batch -> refuse even non-strict
    IndexFamily.requireIdsAbove(spark, path, "doc_id",
      Seq(1L, 2L, 3L).toDF("doc_id"), 1L, 3L, "wmSpec", strict = false)
    val e2 = intercept[IllegalArgumentException] {
      IndexFamily.requireIdsAbove(spark, path, "doc_id",
        Seq(1L, 11L).toDF("doc_id"), 1L, 11L, "wmSpec", strict = false)
    }
    assert(e2.getMessage.contains("NOT a torn-commit redelivery"))
  }

  // -----------------------------------------------------------------
  // Round-14: layout migration (repartitionState) + operator recovery
  // -----------------------------------------------------------------

  test("repartitionState migrates to a new modulus: content identical, merges work, " +
       "stale-modulus tables still refuse") {
    import spark.implicits._
    val dir = tmpDir("mig")
    val path = s"$dir/state.parquet"
    val base = (0L until 120L).map(k => (k, k * 7))
    IndexFamily.writePartitioned(base.toDF("key", "value"), path, "key", 4)
    IndexFamily.repartitionState(spark, path, "key", 16)
    assert(IndexFamily.partsOf(spark, path) == 16)
    assert(stateRows(path) == base.toSet, "migration must not change content")
    // rows physically land under the NEW modulus (probe pruning stays real)
    val k13 = IndexFamily.readPartitions(spark, path, Seq(13))
      .collect().map(_.getLong(0)).toSet
    assert(k13 == base.map(_._1).filter(_ % 16 == 13).toSet)
    // post-migration merges behave exactly like pre-migration ones
    IndexFamily.mergeTouched(spark, path, "key",
      Seq(13L).toDF("key"), Seq((13L, 999L), (1000L, 1L)).toDF("key", "value"))
    assert(stateRows(path) == base.toSet - ((13L, 13L * 7)) + ((13L, 999L)) + ((1000L, 1L)))
    // a same-modulus migration is a no-op that leaves no residue
    IndexFamily.repartitionState(spark, path, "key", 16)
    assert(IndexFamily.partsOf(spark, path) == 16)
  }

  test("a torn migration refuses reads/merges and IndexAdmin rolls it forward or back") {
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path("/tmp")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hp(x: String) = new org.apache.hadoop.fs.Path(x)
    def mkState(tag: String): (String, Seq[(Long, Long)]) = {
      val path = s"${tmpDir(tag)}/state.parquet"
      val rows = (0L until 60L).map(k => (k, k + 500))
      IndexFamily.writePartitioned(rows.toDF("key", "value"), path, "key", 4)
      (path, rows)
    }
    def stageNewLayout(path: String, rows: Seq[(Long, Long)], nNew: Int): Unit =
      rows.toDF("key", "value")
        .withColumn("_p", IndexFamily.partOf(col("key"), nNew))
        .repartition(col("_p"))
        .write.partitionBy("_p").mode("overwrite").parquet(path + ".rewrite")
    def markMigrating(path: String, nNew: Int): Unit = {
      val out = fs.create(hp(path + ".parts.next"), true)
      out.write(nNew.toString.getBytes("UTF-8")); out.close()
    }
    // (a) crash BEFORE the park: staging + marker, table untouched -> BACK
    val (pa, ra) = mkState("miga")
    stageNewLayout(pa, ra, 8); markMigrating(pa, 8)
    IndexFamily.acquireLease(spark, pa) // the crashed run held it
    intercept[IllegalArgumentException] { IndexFamily.partsOf(spark, pa) }
    val repA = IndexAdmin.run(spark, pa, release = true)
    assert(repA.contains("rolled BACK") && repA.contains("lease released"), repA)
    assert(IndexFamily.partsOf(spark, pa) == 4 && stateRows(pa) == ra.toSet)
    assert(!fs.exists(hp(pa + ".rewrite")))
    // (b) crash MID-swap: table parked whole, staging present, no live dir -> FORWARD
    val (pb, rb) = mkState("migb")
    stageNewLayout(pb, rb, 8); markMigrating(pb, 8)
    assert(fs.rename(hp(pb), hp(pb + ".olddir")))
    IndexFamily.acquireLease(spark, pb)
    val repB = IndexAdmin.run(spark, pb, release = true)
    assert(repB.contains("rolled FORWARD"), repB)
    assert(IndexFamily.partsOf(spark, pb) == 8 && stateRows(pb) == rb.toSet)
    assert(!fs.exists(hp(pb + ".olddir")))
    // (c) crash AFTER the promote: new generation live, park still there -> FORWARD
    val (pc, rc) = mkState("migc")
    stageNewLayout(pc, rc, 8); markMigrating(pc, 8)
    assert(fs.rename(hp(pc), hp(pc + ".olddir")))
    assert(fs.rename(hp(pc + ".rewrite"), hp(pc)))
    IndexFamily.acquireLease(spark, pc)
    val repC = IndexAdmin.run(spark, pc, release = true)
    assert(repC.contains("rolled FORWARD"), repC)
    assert(IndexFamily.partsOf(spark, pc) == 8 && stateRows(pc) == rc.toSet)
    assert(!fs.exists(hp(pc + ".olddir")) && !fs.exists(hp(pc + ".parts.next")))
  }

  test("IndexAdmin classifies the three lease-residue states; dry-run changes nothing") {
    import spark.implicits._
    // CLEAN: lease only
    val clean = s"${tmpDir("adm-clean")}/t.parquet"
    Seq((1L, 1L)).toDF("a", "b").write.parquet(clean)
    IndexFamily.acquireLease(spark, clean)
    val r1 = IndexAdmin.run(spark, clean, release = false)
    assert(r1.contains("CLEAN") && r1.contains("HELD") && r1.contains("dry-run"))
    // dry-run must not have touched the lease
    intercept[IllegalArgumentException] { IndexFamily.acquireLease(spark, clean) }
    assert(IndexAdmin.run(spark, clean, release = true).contains("lease released"))
    IndexFamily.acquireLease(spark, clean) // now free again
    IndexFamily.releaseLease(spark, clean)
    // STAGED: .rewrite residue
    val staged = s"${tmpDir("adm-staged")}/t.parquet"
    Seq((1L, 1L)).toDF("a", "b").write.parquet(staged)
    Seq((2L, 2L)).toDF("a", "b").write.parquet(staged + ".rewrite")
    IndexFamily.acquireLease(spark, staged)
    assert(IndexAdmin.run(spark, staged, release = false).contains("STAGED"))
    val r2 = IndexAdmin.run(spark, staged, release = true)
    assert(r2.contains("repaired"))
    val fs = new org.apache.hadoop.fs.Path(staged)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(staged + ".rewrite")))
    // PARKED: an orphaned _p=K.old park
    val parked = s"${tmpDir("adm-parked")}/state.parquet"
    IndexFamily.writePartitioned(
      (0L until 8L).map(k => (k, k)).toDF("key", "value"), parked, "key", 4)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$parked/_p=2"),
      new org.apache.hadoop.fs.Path(s"$parked/_p=2.old")))
    IndexFamily.acquireLease(spark, parked)
    assert(IndexAdmin.run(spark, parked, release = false).contains("PARKED"))
    IndexAdmin.run(spark, parked, release = true)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$parked/_p=2")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$parked/_p=2.old")))
    assert(stateRows(parked).size == 8)
  }

  test("IndexAdmin --release finishes a torn two-table commit: member projection " +
       "rebuilt from the authoritative labels, .txn marker dropped (round-15)") {
    import spark.implicits._
    val dir = tmpDir("txnadm")
    val clusters = s"$dir/clusters.parquet"
    IndexFamily.writePartitioned(
      Seq((1L, 1L, true), (2L, 1L, false), (3L, 3L, true))
        .toDF("doc_id", "cluster_id", "keep"), clusters, "cluster_id", 4)
    // the torn state: labels landed (above), projection stuck at the
    // PRE-merge generation (doc 3 missing, doc 2 mislabeled)
    IndexFamily.writePartitioned(
      Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "cluster_id"),
      s"$dir/members.parquet", "doc_id", 4)
    val fs = new org.apache.hadoop.fs.Path(clusters)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hp(x: String) = new org.apache.hadoop.fs.Path(x)
    fs.create(hp(IndexFamily.txnMarkerPath(clusters)), true).close()
    IndexFamily.acquireLease(spark, clusters) // the crashed run held it
    // dry-run points the operator at the release repair, changes nothing
    val dry = IndexAdmin.run(spark, clusters, release = false)
    assert(dry.contains(".txn cross-table marker present"))
    assert(fs.exists(hp(IndexFamily.txnMarkerPath(clusters))))
    // release: rebuild the projection NOW, not at the next increment
    val report = IndexAdmin.run(spark, clusters, release = true)
    assert(report.contains("txn repair"), report)
    assert(!fs.exists(hp(IndexFamily.txnMarkerPath(clusters))))
    assert(!fs.exists(hp(IndexFamily.leasePath(clusters))))
    val members = IndexFamily.readSnapshot(spark, s"$dir/members.parquet")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(members == Set((1L, 1L), (2L, 1L), (3L, 3L)),
      "projection must equal the authoritative labels after the repair")
  }

  // -----------------------------------------------------------------
  // Round-14: gated newness guard (watermark -> bloom -> exact scan)
  // -----------------------------------------------------------------

  test("newness guard evidence ladder: monotone batch rides the O(1) watermark; " +
       "fresh below-watermark ids ride the bloom; overlaps still refuse") {
    import spark.implicits._
    val dir = tmpDir("gated")
    val path = s"$dir/t.parquet"
    // "build": even ids 0..198, sidecars seeded from the fresh content
    (0L until 200L by 2).map(i => (i, i)).toDF("doc_id", "v").write.parquet(path)
    IndexFamily.seedIdGuards(spark, path, "doc_id")
    assert(IndexFamily.idWatermark(spark, path, "doc_id") == 198L)
    // monotone batch (ids above the watermark): O(1) accept, no table read
    assert(IndexFamily.appendWithIdGuards(
      Seq((200L, 1L), (201L, 1L)).toDF("doc_id", "v"), path, "doc_id",
      2L, 1, "gatedSpec") == 0L)
    assert(IndexFamily.lastNewIdsPath == "watermark",
      s"monotone batch must take the watermark path, took ${IndexFamily.lastNewIdsPath}")
    // the append advanced the watermark with the batch
    assert(IndexFamily.idWatermark(spark, path, "doc_id") == 201L)
    // FRESH ids BELOW the watermark (odd ids): the watermark can't bless
    // them, but the bloom rules (almost) all of them out — accepted with
    // at most a maybe-sized exact re-check, never a refusal
    assert(IndexFamily.appendWithIdGuards(
      (1L until 150L by 2).map(i => (i, i)).toDF("doc_id", "v"), path, "doc_id",
      75L, 1, "gatedSpec") == 0L)
    assert(IndexFamily.lastNewIdsPath.startsWith("bloom"),
      s"below-watermark fresh ids must take the bloom path, took ${IndexFamily.lastNewIdsPath}")
    // overlap (id 4 is stored): bloom says maybe, exact scan convicts
    val e = intercept[IllegalArgumentException] {
      IndexFamily.appendWithIdGuards(
        Seq((4L, 9L)).toDF("doc_id", "v"), path, "doc_id", 1L, 1, "gatedSpec")
    }
    assert(e.getMessage.contains("already present"))
    assert(IndexFamily.lastNewIdsPath == "bloom+scan")
    // and ids appended via the BLOOM path are remembered by it: a strict
    // re-append of an odd id refuses (no false accept after a bloom-path
    // append — the sidecars advanced before those files landed)
    val e2 = intercept[IllegalArgumentException] {
      IndexFamily.appendWithIdGuards(
        Seq((7L, 0L)).toDF("doc_id", "v"), path, "doc_id", 1L, 1, "gatedSpec")
    }
    assert(e2.getMessage.contains("already present"))
  }

  test("deferred bloom maintenance (round-16): small guarded appends leave the " +
       "8MB bloom untouched and land batch-sized pending ids; a crash between " +
       "appends never false-accepts; the cap folds pending into the bloom") {
    import spark.implicits._
    val dir = tmpDir("defer")
    val path = s"$dir/t.parquet"
    (0L until 200L by 2).map(i => (i, i)).toDF("doc_id", "v").write.parquet(path)
    IndexFamily.seedIdGuards(spark, path, "doc_id")
    val bloomBefore = IndexFamily.readIdBloom(spark, path).get._3
    // a small below-watermark append (the bloom path): the bloom FILE must
    // be byte-identical after it — the deferral claim — with the batch ids
    // in the pending sidecar instead
    assert(IndexFamily.appendWithIdGuards(
      Seq((1L, 1L), (3L, 1L)).toDF("doc_id", "v"), path, "doc_id",
      2L, 1, "deferSpec") == 0L)
    assert(java.util.Arrays.equals(bloomBefore,
        IndexFamily.readIdBloom(spark, path).get._3),
      "a small guarded append must not rewrite the bloom sidecar")
    assert(IndexFamily.readPendingIds(spark, path).toSet == Set(1L, 3L))
    // no false accept through the deferral window: a strict re-append of a
    // pending-only id (bloom says no!) must still convict via the pending
    // sidecar's exact re-check
    val e = intercept[IllegalArgumentException] {
      IndexFamily.appendWithIdGuards(Seq((3L, 9L)).toDF("doc_id", "v"),
        path, "doc_id", 1L, 1, "deferSpec")
    }
    assert(e.getMessage.contains("already present"))
    assert(IndexFamily.lastNewIdsPath == "bloom+scan")
    // crash window: pending advanced but files never landed (stale-HIGH).
    // The id goes to the exact re-check, finds nothing, and is accepted
    // fresh — over-checking, never refusal, never silent duplicate
    IndexFamily.writePendingIds(spark, path,
      IndexFamily.readPendingIds(spark, path) :+ 999L)
    assert(IndexFamily.appendWithIdGuards(Seq((999L, 9L)).toDF("doc_id", "v"),
      path, "doc_id", 1L, 1, "deferSpec") == 0L,
      "a pending id whose append crashed before landing must be accepted fresh")
    // the cap folds pending into the bloom (bloom-before-truncate): force
    // it with a batch that overflows the cap, then the bloom must convict
    // a redelivered id WITHOUT any pending file
    val big = (100001L to 100000L + IndexFamily.PendingIdsCap)
      .map(i => (i, 0L)).toDF("doc_id", "v")
    // ids above the watermark would ride the O(1) path and skip the bloom
    // machinery entirely — push the watermark up first
    IndexFamily.advanceIdWatermark(spark, path, 500000L)
    assert(IndexFamily.appendWithIdGuards(big, path, "doc_id",
      IndexFamily.PendingIdsCap.toLong, 1, "deferSpec") == 0L)
    assert(IndexFamily.readPendingIds(spark, path).isEmpty,
      "overflowing the cap must fold pending into the bloom and truncate")
    assert(!java.util.Arrays.equals(bloomBefore,
        IndexFamily.readIdBloom(spark, path).get._3),
      "the fold must have rewritten the bloom")
    val e2 = intercept[IllegalArgumentException] {
      IndexFamily.appendWithIdGuards(Seq((100001L, 9L)).toDF("doc_id", "v"),
        path, "doc_id", 1L, 1, "deferSpec")
    }
    assert(e2.getMessage.contains("already present"))
  }

  test("guarded append's newness check runs INSIDE the table lease (round-15 " +
       "TOCTOU closure): every evaluation of the batch happens with the lease " +
       "held, and a concurrent holder forces up-front refusal") {
    import spark.implicits._
    val dir = tmpDir("toctou")
    val path = s"$dir/t.parquet"
    (0L until 10L).map(i => (i, i)).toDF("doc_id", "v").write.parquet(path)
    IndexFamily.seedIdGuards(spark, path, "doc_id")
    // every task-side evaluation of the batch records whether the lease
    // file existed at that moment (local mode shares one filesystem) — if
    // the newness check ran before the lease, its evaluation is the
    // un-leased one and the two counters diverge
    val evals = spark.sparkContext.longAccumulator("toctou-evals")
    val underLease = spark.sparkContext.longAccumulator("toctou-under-lease")
    val leaseFile = new java.io.File(IndexFamily.leasePath(path))
    val batch = spark.range(20, 24).map { id =>
      evals.add(1L)
      if (leaseFile.exists()) underLease.add(1L)
      id
    }.toDF("doc_id").withColumn("v", col("doc_id"))
    assert(IndexFamily.appendWithIdGuards(batch, path, "doc_id", 4L, 1,
      "toctouSpec") == 0L)
    assert(evals.value > 0L)
    assert(underLease.value == evals.value,
      s"the batch was evaluated OUTSIDE the lease (${evals.value} evaluations, " +
        s"${underLease.value} under the lease) — check-then-append is not atomic " +
        "vs a concurrent guarded append of overlapping ids")
    // interleaved writers: while one holds the lease, a second guarded
    // append of overlapping ids REFUSES instead of landing a stale verdict
    IndexFamily.acquireLease(spark, path)
    try {
      val e = intercept[IllegalArgumentException] {
        IndexFamily.appendWithIdGuards(Seq((20L, 9L)).toDF("doc_id", "v"),
          path, "doc_id", 1L, 1, "toctouSpec")
      }
      assert(e.getMessage.contains("under maintenance"))
    } finally IndexFamily.releaseLease(spark, path)
    // and once the first writer released, the second's (in-lease) check
    // sees the first's rows and refuses on the newness contract
    val e2 = intercept[IllegalArgumentException] {
      IndexFamily.appendWithIdGuards(Seq((20L, 9L)).toDF("doc_id", "v"),
        path, "doc_id", 1L, 1, "toctouSpec")
    }
    assert(e2.getMessage.contains("already present"))
  }

  test("crashed append (sidecars advanced, files never landed) over-scans but never " +
       "wedges: requireNewIds re-accepts the redelivery; requireIdsAbove tolerates " +
       "non-strict via the stored-max re-check") {
    import spark.implicits._
    val dir = tmpDir("crashwin")
    val path = s"$dir/t.parquet"
    (1L to 10L).map(i => (i, i)).toDF("doc_id", "v").write.parquet(path)
    IndexFamily.seedIdGuards(spark, path, "doc_id")
    // simulate the crash window: watermark+bloom advanced for ids 15..18,
    // files never landed
    IndexFamily.advanceIdWatermark(spark, path, 18L)
    IndexFamily.advanceIdBloom(spark, path, Seq(15L, 16L, 17L, 18L).toDF("doc_id"), "doc_id")
    val redelivery = Seq(15L, 16L, 17L, 18L).toDF("doc_id")
    // newness guard: watermark can't bless, bloom says maybe, the exact
    // scan finds nothing stored -> accepted on BOTH strictness levels
    assert(IndexFamily.requireNewIds(spark, path, "doc_id", redelivery, 4L, "crashSpec") == 0L)
    assert(IndexFamily.lastNewIdsPath == "bloom+scan")
    // ordering guard, stream path: no batch id present AND stored max 10 <
    // batch min 15 -> the stale-high-watermark redelivery case, tolerated
    IndexFamily.requireIdsAbove(spark, path, "doc_id", redelivery, 15L, 18L,
      "crashSpec", strict = false)
    // a GENUINELY out-of-order fresh batch (min below stored max) still
    // refuses even non-strict
    val e = intercept[IllegalArgumentException] {
      IndexFamily.requireIdsAbove(spark, path, "doc_id",
        Seq(5L, 25L).toDF("doc_id"), 5L, 25L, "crashSpec", strict = false)
    }
    assert(e.getMessage.contains("NOT a torn-commit redelivery"))
  }

  test("minhash increment: a healthy monotone batch appends without any stored-id scan") {
    val split = Dedup.incrementSplitAt(spark, sf)
    val idx = tmpDir("wmpath")
    val d = Tables(spark, sf, "documents")
    Dedup.buildMinhashIndex(spark, d.filter(col("doc_id") < split), idx, s"$idx#b")
    Dedup.dedupIncrement(spark, d.filter(col("doc_id") >= split), idx,
      s"$idx#n", append = true).collect()
    assert(IndexFamily.lastNewIdsPath == "watermark",
      "the arrival-order convention's healthy batch must never read the stored " +
        s"id column; guard took ${IndexFamily.lastNewIdsPath}")
  }

  test("re-ingesting already-indexed ids refuses strictly, warns on the stream replay path") {
    val idx = tmpDir("newids")
    val d = Tables(spark, sf, "documents")
    Dedup.buildMinhashIndex(spark, d.filter(col("doc_id") < 100), idx, s"$idx#b")
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupIncrement(spark, d.filter(col("doc_id") < 50), idx,
        s"$idx#dup", append = true)
    }
    assert(e.getMessage.contains("already present"))
    // the stream replay path (strictIds = false) tolerates the overlap —
    // the torn-commit redelivery contract (duplicates; compact repairs)
    val before = spark.read.parquet(s"$idx/signatures.parquet").count()
    Dedup.dedupIncrement(spark, d.filter(col("doc_id") < 50), idx,
      s"$idx#replay", append = true, strictIds = false).collect()
    assert(spark.read.parquet(s"$idx/signatures.parquet").count() > before)
    Dedup.compactIndex(spark, idx, nFiles = 2)
    assert(spark.read.parquet(s"$idx/signatures.parquet").count() == before,
      "compact must repair the duplicated rows")
  }
}
