package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps
import graft.operators.Dedup

/** SemDeDup (semantic dedup over the embedding space): the keep rule on a
  * hand-built geometry, a full driver-side re-implementation of the literal
  * tier (assignment, intra-cluster matrix, closure, keep rule — an
  * independent oracle beyond the DuckDB hash gate), and the structural
  * invariants of the learned tier.
  */
class SemanticDedupSpec extends AnyFunSuite with SparkTestBase {

  // mirror of the native DotProduct loop: sequential left fold, per-element
  // float->double widening — the arithmetic-order contract the parity
  // assertions below depend on
  private def dot(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def cos(a: Seq[Double], b: Seq[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  test("keep rule retains the farthest-from-centroid member, not the min id") {
    import spark.implicits._
    // one tight semantic group assigned to centroid (1,0,0,0): cent-cosine
    // DECREASES with id (v12 is the most atypical), so the paper's rule must
    // keep the LARGEST id — distinguishing it from a min-id keep policy
    val vecs = Seq(
      10L -> Array(1.0f, 0.0f, 0.0f, 0.0f),
      11L -> Array(0.95f, 0.05f, 0.0f, 0.0f),
      12L -> Array(0.9f, 0.1f, 0.0f, 0.0f),
      20L -> Array(0.0f, 1.0f, 0.0f, 0.0f)) // other cell, singleton
      .toDF("vec_id", "embedding")
    val cents = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))
    val out = Dedup.semanticDedupWith(spark, vecs, cents, tau = 0.9)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cid"), r.getAs[Long]("cluster_id"), r.getAs[Int]("keep")))).toMap
    assert(out(10L) == ((0L, 10L, 0)))
    assert(out(11L) == ((0L, 10L, 0)))
    assert(out(12L) == ((0L, 10L, 1)), "the farthest-from-centroid member must be kept")
    assert(out(20L) == ((1L, 20L, 1)), "a singleton keeps itself")
  }

  test("literal tier matches an independent driver-side reference end to end") {
    val cents = VectorOps.hyperplanes(8, 64, seed = 31L) // SemLitCents
    val tau = Dedup.SemDedupTau
    val e = Tables(spark, sf, "embeddings").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toSeq)
      .sortBy(_._1)
    // assignment: argmax cosine, ties toward the higher cid
    val asg = e.map { case (id, v) =>
      val best = cents.zipWithIndex.map { case (c, i) => (cos(v, c), i) }.max
      (id, v, best._2.toLong, math.floor(best._1 * 10000.0 + 0.5).toLong)
    }
    // intra-cluster pairs >= tau, then union-find to component minima
    val byCell = asg.groupBy(_._3)
    val parent = scala.collection.mutable.Map(asg.map(a => a._1 -> a._1): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    for (cell <- byCell.values; i <- cell.indices; j <- (i + 1) until cell.length
         if cos(cell(i)._2, cell(j)._2) >= tau) {
      val (ra, rb) = (find(cell(i)._1), find(cell(j)._1))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
    }
    val expected = asg.groupBy(a => find(a._1)).toSeq.flatMap { case (root, members) =>
      val pick = members.map(m => (m._4, m._1)).min
      members.map(m => (m._1, m._3, root, m._4, if (m._1 == pick._2) 1 else 0))
    }.toSet
    val got = Dedup.semanticDedupLitQuery(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cid"),
        r.getAs[Long]("cluster_id"), r.getAs[Long]("cent_e4"),
        r.getAs[Int]("keep"))).toSet
    assert(got == expected)
    assert(got.count(_._5 == 1) < got.size, "corpus must contain semantic groups")
  }

  test("semantic increment == full recompute restricted to touched groups") {
    import org.apache.spark.sql.functions.col
    val cents = VectorOps.hyperplanes(8, 64, seed = 31L)
    val split = 400L
    val vecs = Tables(spark, sf, "embeddings").select(col("vec_id"), col("embedding"))
    val idx = java.nio.file.Files.createTempDirectory("semidx-law-").toString
    Dedup.buildSemanticIndex(spark, vecs.filter(col("vec_id") < split), idx, cents)
    val got = Dedup.semanticDedupIncrement(spark,
        vecs.filter(col("vec_id") >= split), idx, append = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSet
    val full = Dedup.semanticDedupWith(spark, vecs, cents).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cid"),
        r.getAs[Long]("cluster_id"), r.getAs[Long]("cent_e4"),
        r.getAs[Int]("keep")))
    val batchClusters = full.filter(_._1 >= split).map(_._3).toSet
    val expected = full.filter(t => batchClusters(t._3)).toSet
    assert(got == expected)
    assert(expected.exists(t => t._1 < split && t._5 == 0) ||
           expected.exists(t => t._1 < split),
      "fixture should touch at least one pre-existing group")
  }

  test("appended semantic increments converge to the one-shot rebuild state") {
    import org.apache.spark.sql.functions.col
    val cents = VectorOps.hyperplanes(8, 64, seed = 31L)
    val vecs = Tables(spark, sf, "embeddings").select(col("vec_id"), col("embedding"))
    def stateOf(dir: String): Set[(Long, Long, Int)] =
      spark.read.parquet(s"$dir/groups.parquet").collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster_id"),
          r.getAs[Int]("keep"))).toSet
    val inc = java.nio.file.Files.createTempDirectory("semidx-inc-").toString
    Dedup.buildSemanticIndex(spark, vecs.filter(col("vec_id") < 300), inc, cents)
    Dedup.semanticDedupIncrement(spark,
      vecs.filter(col("vec_id") >= 300 && col("vec_id") < 400), inc).collect()
    Dedup.semanticDedupIncrement(spark, vecs.filter(col("vec_id") >= 400), inc).collect()
    val oneShot = java.nio.file.Files.createTempDirectory("semidx-full-").toString
    Dedup.buildSemanticIndex(spark, vecs, oneShot, cents)
    assert(stateOf(inc) == stateOf(oneShot))
    assert(graft.operators.IndexFamily
      .readSnapshot(spark, s"$inc/vectors.parquet").count() == vecs.count())
  }

  test("stored-depth law (round-17): a build past the dense cutoff persists " +
       "the covering-sized depth, increments serve it, and convergence holds") {
    import org.apache.spark.sql.functions.col
    import graft.functions.CentroidAssign
    // K=64 > DenseCutoff: the two-level path where nProbe genuinely
    // matters (the registered twin's literal model)
    val cents = Dedup.SemTwoLevelCents
    val vecs = Tables(spark, sf, "embeddings").select(col("vec_id"), col("embedding"))
    val build = vecs.filter(col("vec_id") < 300)
    val idx = java.nio.file.Files.createTempDirectory("semidx-depth-").toString
    Dedup.buildSemanticIndex(spark, build, idx, cents)
    // the persisted depth IS the covering rule's choice over the build
    // corpus (deterministic hash-ordered sample — recomputable)
    val meta = spark.read.parquet(s"$idx/meta.parquet").head()
    val stored = meta.getInt(meta.fieldIndex("n_probe"))
    val expected = CentroidAssign.nProbeForCoveringOf(
      build, "embedding", cents, Dedup.SemAssignCoveringTarget)
    assert(stored == expected, s"stored depth $stored != covering rule's $expected")
    assert(stored >= 1 && stored <= math.ceil(math.sqrt(64.0)).toInt)
    // increments assign at the STORED depth, so appended state converges
    // to a one-shot rebuild pinned at that same depth (the depth is part
    // of the frozen model — the comparison arm must not re-size over its
    // own corpus)
    Dedup.semanticDedupIncrement(spark,
      vecs.filter(col("vec_id") >= 300 && col("vec_id") < 400), idx).collect()
    Dedup.semanticDedupIncrement(spark, vecs.filter(col("vec_id") >= 400), idx).collect()
    val oneShot = java.nio.file.Files.createTempDirectory("semidx-depth-full-").toString
    Dedup.buildSemanticIndex(spark, vecs, oneShot, cents,
      assignDepth = Some(stored))
    def stateOf(dir: String): Set[(Long, Long, Int)] =
      spark.read.parquet(s"$dir/groups.parquet").collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster_id"),
          r.getAs[Int]("keep"))).toSet
    assert(stateOf(idx) == stateOf(oneShot),
      "stored-depth increments must converge to the pinned-depth rebuild")
  }

  test("an empty batch is a no-op on the semantic index") {
    import org.apache.spark.sql.functions.col
    val cents = VectorOps.hyperplanes(8, 64, seed = 31L)
    val vecs = Tables(spark, sf, "embeddings").select(col("vec_id"), col("embedding"))
    val idx = java.nio.file.Files.createTempDirectory("semidx-empty-").toString
    Dedup.buildSemanticIndex(spark, vecs, idx, cents)
    val before = spark.read.parquet(s"$idx/groups.parquet").collect()
      .map(_.toString).sorted.toSeq
    val out = Dedup.semanticDedupIncrement(spark, vecs.limit(0), idx)
    assert(out.count() == 0)
    val after = spark.read.parquet(s"$idx/groups.parquet").collect()
      .map(_.toString).sorted.toSeq
    assert(after == before, "state must survive an empty increment verbatim")
  }

  test("learned tier: groups lie inside one k-means cell, exactly one keep each") {
    val rows = Dedup.semanticDedup(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cid"),
        r.getAs[Long]("cluster_id"), r.getAs[Int]("keep")))
    assert(rows.length == Tables(spark, sf, "embeddings").count())
    rows.groupBy(_._3).foreach { case (cl, members) =>
      assert(members.count(_._4 == 1) == 1, s"group $cl must keep exactly one member")
      assert(members.map(_._2).distinct.length == 1,
        s"group $cl spans k-means cells — pairs are intra-cluster by construction")
      assert(members.map(_._1).min == cl, "group label is the member minimum")
    }
  }

  test("two-level assignment == dense argmax where the probed cells cover the " +
       "true max, and everywhere at nProbe = all cells (round-15)") {
    import org.apache.spark.sql.functions.{array_contains, col}
    import graft.functions.CentroidAssign
    val e = Tables(spark, sf, "embeddings").select(col("vec_id"), col("embedding"))
    // K=64 > DenseCutoff: THE registered twin's literal model
    // (Dedup.SemTwoLevelCents — single-sourced so the spec can never
    // drift from the model q_sem_assign_twolevel_lit actually gates);
    // k-means-model geometry: 8 base directions × 8 jitters each —
    // i.i.d. Gaussian directions are pairwise near-orthogonal in d=64,
    // no coarse structure exists, and covering degrades toward the
    // nProbe·K/C floor (the documented worst case, not the deployment
    // shape)
    val cents = Dedup.SemTwoLevelCents
    val nGroups = math.ceil(math.sqrt(cents.length.toDouble)).toInt
    def best(df: org.apache.spark.sql.DataFrame, tag: String,
             denseCutoff: Int, nProbe: Int) =
      CentroidAssign.withBestCentroid(df, "embedding", cents,
        cidName = s"cid_$tag", simName = s"sim_$tag",
        nProbe = nProbe, denseCutoff = denseCutoff)
    // (a) FULL covering: probing every coarse cell is the dense argmax on
    // every row — same winner, same tie direction, same sim arithmetic
    // (the mapPartitions loop mirrors DotProduct's float→double fold)
    val both = best(best(e, "d", Int.MaxValue, 1), "t", 0, nGroups)
    val full = both.where(col("cid_d") =!= col("cid_t") ||
      col("sim_d") =!= col("sim_t")).count()
    assert(full == 0L, s"$full rows diverge under full probing — the two-level " +
      "path must be a pure evaluation-order rewrite of the dense argmax")
    // (b) PARTIAL probing (the deployment shape, nProbe=2): equality on
    // exactly the rows whose probed cells contain the dense winner — the
    // IVF covering condition — and the covered fraction is the recall-
    // style knob, so it must be the overwhelming majority here
    val nProbe = 2
    val part = CentroidAssign.withProbedCids(
      best(best(e, "d", Int.MaxValue, 1), "t", 0, nProbe),
      "embedding", cents, nProbe, "probed")
    val bad = part.where(
      array_contains(col("probed"), col("cid_d")) &&
        (col("cid_d") =!= col("cid_t") || col("sim_d") =!= col("sim_t"))).count()
    assert(bad == 0L, s"$bad covered rows diverge from the dense argmax")
    val n = e.count()
    val covered = part.where(array_contains(col("probed"), col("cid_d"))).count()
    assert(covered >= (n * 9) / 10,
      s"only $covered/$n rows covered at nProbe=$nProbe — the coarse " +
        "quantizer is not capturing the geometry")
    // (c) AUTO-SIZED covering (round-16): the sizing rule must choose an
    // nProbe that actually achieves its target on the full corpus — the
    // covering floor is now the PARAMETER, not a hardcoded fraction
    val target = 0.95
    val auto = CentroidAssign.nProbeForCoveringOf(e, "embedding", cents, target)
    assert(auto >= 1 && auto <= nGroups, s"auto nProbe $auto out of range")
    val autoPart = CentroidAssign.withProbedCids(
      best(e, "d2", Int.MaxValue, 1), "embedding", cents, auto, "probed")
    val autoCovered = autoPart
      .where(array_contains(col("probed"), col("cid_d2"))).count()
    assert(autoCovered >= math.ceil(target * n).toLong,
      s"auto nProbe=$auto covers only $autoCovered/$n — below the $target target")
    // monotonicity: a stricter target never picks a smaller probe depth
    val stricter = CentroidAssign.nProbeForCoveringOf(e, "embedding", cents, 1.0)
    assert(stricter >= auto)
  }
}
