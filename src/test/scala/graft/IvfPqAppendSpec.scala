package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps
import graft.operators.Similarity

/** Laws of the persisted IVF-PQ index's append path (round-11 verdict
  * task 4): appending with the FROZEN stored model must be
  * indistinguishable from having built the whole index at once with that
  * model — encoding is a pure per-vector function of (vector, model), so
  * the law holds for ANY model; the first test uses learned coarse
  * centroids (the deployment shape: model frozen before the batch
  * existed) with deterministic codebooks. */
class IvfPqAppendSpec extends AnyFunSuite with SparkTestBase {

  private def emb = Tables(spark, sf, "embeddings")
  private def tmpIdx(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"ivfpq-append-$tag-").toString

  private def searchRows(indexDir: String): Seq[(Long, Long, Long, Long)] =
    Similarity.annIvfPqSearch(spark, sf, indexDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted

  test("search over an appended index equals search over a same-model full rebuild") {
    val split = Similarity.ivfPqAppendSplitAt(spark, sf)
    val old = emb.filter(col("vec_id") < split)
    val batch = emb.filter(col("vec_id") >= split)
    // the frozen model: coarse centroids LEARNED on the old split only,
    // deterministic codebooks (learnPqCodebooks' training-sample plumbing
    // is exercised by the build queries; the append law is model-agnostic)
    val cents = Similarity.learnCentroids(spark, old)
    val books = VectorOps.hyperplanes(8 * 16, 8, seed = 77L)
    val idxAppended = tmpIdx("appended")
    Similarity.buildIvfPqIndexOver(spark, old, idxAppended, cents, books)
    val appended = Similarity.appendToIvfPqIndex(spark, batch, idxAppended)
    assert(appended.count() == batch.count() * 8, "m codes per appended vector")
    val idxFull = tmpIdx("full")
    Similarity.buildIvfPqIndexOver(spark, emb, idxFull, cents, books)
    assert(searchRows(idxAppended) == searchRows(idxFull),
      "appended index and same-model full rebuild must serve identical results")
  }

  test("build above the dense cutoff persists the covering-sized assignment " +
       "depth and append serves it (round-17: stored-depth law)") {
    import graft.functions.CentroidAssign
    val split = Similarity.ivfPqAppendSplitAt(spark, sf)
    val old = emb.filter(col("vec_id") < split)
    val batch = emb.filter(col("vec_id") >= split)
    // K=64 > DenseCutoff: the two-level assignment path, where a fixed
    // nProbe=2 and the covering-sized depth can genuinely disagree
    val cents = graft.operators.Dedup.SemTwoLevelCents
    val books = VectorOps.hyperplanes(8 * 16, 8, seed = 79L)
    val idxAppended = tmpIdx("depth-appended")
    Similarity.buildIvfPqIndexOver(spark, old, idxAppended, cents, books)
    // the persisted 5th meta value IS the covering rule's choice over the
    // build corpus (deterministic hash-ordered sample — recomputable)
    val meta = spark.read.parquet(s"$idxAppended/model.parquet")
      .filter(col("kind") === "meta").head().getSeq[Double](2)
    assert(meta.length == 5, s"meta row must carry the assignment depth: $meta")
    val expected = CentroidAssign.nProbeForCoveringOf(
      old.select(col("vec_id"), col("embedding")), "embedding", cents,
      Similarity.AssignCoveringTarget)
    assert(meta(4).toInt == expected,
      s"stored depth ${meta(4).toInt} != covering rule's $expected")
    assert(expected >= 1 && expected <= math.ceil(math.sqrt(64.0)).toInt)
    // append ≡ same-model rebuild must STILL hold through the stored
    // depth — the law that breaks if append assigned at a different
    // depth. The depth is part of the frozen model, so the rebuild arm
    // pins it (its own corpus would size a possibly-different one)
    Similarity.appendToIvfPqIndex(spark, batch, idxAppended)
    val idxFull = tmpIdx("depth-full")
    Similarity.buildIvfPqIndexOver(spark, emb, idxFull, cents, books,
      assignDepth = Some(expected))
    assert(searchRows(idxAppended) == searchRows(idxFull),
      "appended index and same-model full rebuild diverged at the stored depth")
  }

  test("append refuses an index built under different hyperparameters") {
    val idx = tmpIdx("mismatch")
    Similarity.buildIvfPqIndexOver(spark, emb.filter(col("vec_id") < 100), idx,
      VectorOps.hyperplanes(8, 64, seed = 5L), VectorOps.hyperplanes(8 * 16, 8, seed = 6L))
    val e = intercept[IllegalArgumentException] {
      Similarity.appendToIvfPqIndex(spark, emb.filter(col("vec_id") >= 100 && col("vec_id") < 120),
        idx, m = 4, subDim = 16, k = 16)
    }
    assert(e.getMessage.contains("built with"))
  }

  test("append cost surface touches only the batch (plan reads no old codes)") {
    // the append's encode plan must scan the batch vectors and the model
    // only — never the index's existing codes; assert by pointing the
    // "index" at a dir whose codes are then DELETED: append still works
    // because nothing reads them
    val idx = tmpIdx("batchonly")
    Similarity.buildIvfPqIndexOver(spark, emb.filter(col("vec_id") < 50), idx,
      VectorOps.hyperplanes(8, 64, seed = 5L), VectorOps.hyperplanes(8 * 16, 8, seed = 6L))
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rmTree)
      f.delete()
    }
    rmTree(new java.io.File(s"$idx/codes.parquet")) // cid-partitioned dirs too
    val appended = Similarity.appendToIvfPqIndex(spark,
      emb.filter(col("vec_id") >= 50 && col("vec_id") < 60), idx)
    assert(appended.count() == 10 * 8)
  }

  test("drift telemetry: same-distribution batch is in-fit, a collapsed batch arms the trigger") {
    val split = Similarity.ivfPqAppendSplitAt(spark, sf)
    val old = emb.filter(col("vec_id") < split)
    val batch = emb.filter(col("vec_id") >= split)
    val idx = tmpIdx("drift")
    // centroids learned over the FULL corpus so both splits face the model
    // symmetrically: the fit law under test is "same distribution ⇒ fit ≈
    // baseline", not the small-corpus overfit margin (which the scaladoc
    // documents — at spec scale the k-means training sample IS the build
    // corpus, so a model trained on `old` alone scores `old` optimistically)
    Similarity.buildIvfPqIndexOver(spark, old, idx,
      Similarity.learnCentroids(spark, emb),
      VectorOps.hyperplanes(8 * 16, 8, seed = 77L))
    val same = Similarity.ivfPqDriftCheck(spark, idx, batch)
    assert(same.isDefined, "build must store drift baselines")
    assert(!same.get.drifted,
      s"same-distribution batch flagged drifted: $same")
    // a COLLAPSED batch — every vector identical, so the whole batch lands
    // in one IVF list: per-vector fit stays healthy (it IS near a
    // centroid), but the occupancy leg sees the hot-list profile
    val collapsed = batch.select(col("vec_id"),
      transform(col("embedding"), x => lit(0.1)).as("embedding"))
    val drift = Similarity.ivfPqDriftCheck(spark, idx, collapsed)
    assert(drift.exists(_.occDrifted), s"collapsed batch not flagged: $drift")
    assert(drift.get.occupancyTv > 0.25)
  }
}
