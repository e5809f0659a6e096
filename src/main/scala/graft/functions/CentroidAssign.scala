package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}

/** Argmax-cosine centroid assignment with a SUB-LINEAR-in-K evaluation
  * path (round-15 — closes the `n·K·dim` assignment term §8.5.11 admits).
  *
  * The dense form — `greatest` over one `(sim, cid)` struct per centroid —
  * evaluates every centroid for every row: ∝ n·K·dim, untenable at the
  * SemDeDup paper's K≈50 000 (Abbas et al. 2023, arXiv:2303.09540 §3,
  * which ran K-means at that K over 5 B embeddings). The IVF idea applied
  * to the quantizer itself fixes it: group the K centroids under C≈√K
  * coarse cells (a tiny driver-side k-means over the K centroid VECTORS —
  * model grain), then per row rank the C coarse cells, probe the `nProbe`
  * nearest, and argmax only over the probed cells' member centroids —
  * ∝ n·(C + nProbe·K/C)·dim ≈ n·√K·dim at nProbe=O(1).
  *
  * WHY `mapPartitions`, not expressions, above the cutoff: the two-level
  * rewrite as literal `CASE WHEN gid … greatest(members)` trees was built
  * and MEASURED first — at K=256 it ran 1.6× SLOWER than dense and at
  * K=1024 the generated code blows the JVM's 64 KB method limit (whole-
  * stage codegen bails to interpretation, where a K-sized expression tree
  * costs ∝ K per row regardless of which CASE branch fires). A K-sized
  * model does not belong in the plan as literals at all — it is DATA: a
  * task broadcast of primitive arrays plus one compiled per-row loop
  * (§8.5.11's assigncost rows price the win; same justification class as
  * the typed featurizer flatMaps). The map-only shape is preserved — no
  * shuffle, no join — and the scalar arithmetic mirrors
  * [[graft.functions.expressions.DotProduct]]'s sequential float→double
  * left fold, so the result is BIT-IDENTICAL to the dense argmax wherever
  * the probed cells cover the true max (SemanticDedupSpec pins equality
  * under full probing on every row, and on every covered row at small
  * nProbe).
  *
  * Below [[DenseCutoff]] the dense column form runs unchanged — the
  * hash-gated literal twins (K ≤ 16 models) keep their exact codegen'd
  * plan, and two-level has no evaluation win there anyway. */
object CentroidAssign {

  /** Dense/two-level switchover: at or below this K the dense argmax is
    * both cheaper (no coarse pass, no broadcast) and oracle-exact. The
    * assigncost probe puts the crossover between K=64 and K=256 on
    * 64-dim embeddings; 32 keeps every registered literal-model tier
    * (K ≤ 16) dense with margin. */
  val DenseCutoff = 32

  /** [[graft.functions.expressions.DotProduct]]'s exact loop: sequential
    * left fold, double accumulator. */
  private def dotDD(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Group the K centroids under `nGroups` coarse cells: deterministic
    * driver-side Lloyd's over the centroid VECTORS (spread init on index,
    * cosine metric — the same geometry the row-side coarse ranking uses),
    * empty cells dropped. Returns `(coarse centroids, member cids per
    * coarse cell)` — every cid appears in exactly one cell. Driver cost
    * ∝ K·nGroups·dim·iters: model grain (50k·224·768·4 ≈ 10⁸ flops·iter,
    * seconds once per model, never per row). */
  private[graft] def coarsen(cents: Seq[Seq[Double]], nGroups: Int,
                             iters: Int = 4): (Seq[Seq[Double]], Seq[Seq[Int]]) = {
    val k = cents.length
    require(nGroups >= 1 && nGroups <= k, s"nGroups $nGroups out of range for K=$k")
    val dim = cents.head.length
    val ca = cents.map(_.toArray).toArray
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = math.sqrt(dotDD(a, a)) * math.sqrt(dotDD(b, b))
      if (d == 0.0) -1.0 else dotDD(a, b) / d
    }
    def assign(coarse: IndexedSeq[Array[Double]]): Array[Int] =
      Array.tabulate(k) { i =>
        var best = 0; var bestSim = Double.NegativeInfinity; var j = 0
        while (j < coarse.length) {
          val s = cos(ca(i), coarse(j))
          if (s > bestSim) { best = j; bestSim = s }
          j += 1
        }
        best
      }
    var coarse: IndexedSeq[Array[Double]] =
      (0 until nGroups).map(g => ca(((g.toLong * k) / nGroups).toInt))
    for (_ <- 0 until iters) {
      val a = assign(coarse)
      coarse = coarse.indices.map { j =>
        val mem = (0 until k).filter(a(_) == j)
        if (mem.isEmpty) coarse(j)
        else Array.tabulate(dim)(d => mem.iterator.map(i => ca(i)(d)).sum / mem.size)
      }
    }
    val fin = assign(coarse)
    val live = coarse.indices.filter(j => fin.contains(j))
    (live.map(j => coarse(j).toSeq), live.map(j => (0 until k).filter(fin(_) == j)))
  }

  /** The DENSE `(sim, cid)` argmax struct over literal centroids — the
    * historical `greatest` form, bit-for-bit (the literal-twin oracle
    * plans ride this). `cidLit` renders the ordinal in the caller's cid
    * type. Callers must keep K ≤ [[DenseCutoff]]-class sizes; use
    * [[withBestCentroid]] for model-size-agnostic assignment. */
  def bestDense(vec: Column, cents: Seq[Seq[Double]],
                cidLit: Int => Column): Column = {
    def scoreOf(i: Int): Column =
      struct(VectorOps.cosine(vec, array(cents(i).map(lit): _*)).as("sim"),
             cidLit(i).as("cid"))
    if (cents.length == 1) scoreOf(0)
    else greatest(cents.indices.map(scoreOf): _*)
  }

  /** The immutable task-side model: centroids, their norms, coarse cells,
    * their norms, and the member cids per coarse cell. */
  private final case class Model(cents: Array[Array[Double]],
                                 centNorm: Array[Double],
                                 coarse: Array[Array[Double]],
                                 coarseNorm: Array[Double],
                                 members: Array[Array[Int]]) extends Serializable

  private def buildModel(cents: Seq[Seq[Double]], nGroups: Int): Model = {
    val (coarse, members) = coarsen(cents, nGroups)
    val ca = cents.map(_.toArray).toArray
    val co = coarse.map(_.toArray).toArray
    Model(ca, ca.map(c => math.sqrt(dotDD(c, c))),
          co, co.map(c => math.sqrt(dotDD(c, c))),
          members.map(_.toArray).toArray)
  }

  /** Σ vᵢ·c (float→double widening on the vector side — DotProduct's
    * loop). */
  private def dotFD(v: Array[Float], c: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * c(i); i += 1 }
    s
  }

  /** Spark's Double ordering for argmax comparisons: `Double.compare`
    * ranks NaN ABOVE every value and equal to itself — exactly how the
    * dense `greatest(struct(sim, cid))` expression orders a NaN cosine
    * (an all-zero vector makes every sim 0/0 = NaN and the dense path
    * tie-breaks to the highest cid; the scalar loop must agree or the
    * two paths diverge on that edge). */
  private def better(sim: Double, cid: Int, bSim: Double, bCid: Int): Boolean = {
    val c = java.lang.Double.compare(sim, bSim)
    c > 0 || (c == 0 && cid > bCid)
  }

  /** The probed coarse cells for one vector: top-`probes` gids by
    * (sim, gid) with ties toward the HIGHER gid — the fine argmax's own
    * tie direction (NaN-largest, [[better]]). */
  private def topCells(m: Model, emb: Array[Float], vNorm: Double,
                       probes: Int): Array[Int] = {
    val c = m.coarse.length
    val sims = new Array[Double](c)
    var j = 0
    while (j < c) {
      sims(j) = dotFD(emb, m.coarse(j)) / (vNorm * m.coarseNorm(j))
      j += 1
    }
    val picked = new Array[Int](probes)
    val taken = new Array[Boolean](c)
    var p = 0
    while (p < probes) {
      var best = -1; var bestSim = Double.NaN
      j = 0
      while (j < c) {
        if (!taken(j) && (best < 0 || better(sims(j), j, bestSim, best))) {
          best = j; bestSim = sims(j)
        }
        j += 1
      }
      taken(best) = true; picked(p) = best; p += 1
    }
    picked
  }

  /** `(cid, sim)` of the two-level argmax for one vector: fine argmax
    * over the probed cells' members, dense tie rule (max sim, then max
    * cid, NaN-largest). Arithmetic mirrors `cosine` = dot/(‖v‖·‖c‖) with
    * DotProduct's fold — bit-identical to the dense expression on
    * covered rows. */
  private def bestTwoLevel(m: Model, emb: Array[Float],
                           probes: Int): (Int, Double) = {
    var na = 0.0; var i = 0
    while (i < emb.length) { na += emb(i).toDouble * emb(i).toDouble; i += 1 }
    val vNorm = math.sqrt(na)
    val cells = topCells(m, emb, vNorm, probes)
    var bestCid = -1; var bestSim = Double.NaN
    var p = 0
    while (p < cells.length) {
      val mem = m.members(cells(p))
      var q = 0
      while (q < mem.length) {
        val cid = mem(q)
        val sim = dotFD(emb, m.cents(cid)) / (vNorm * m.centNorm(cid))
        if (bestCid < 0 || better(sim, cid, bestSim, bestCid)) {
          bestCid = cid; bestSim = sim
        }
        q += 1
      }
      p += 1
    }
    (bestCid, bestSim)
  }

  private def floatArrayOf(r: Row, idx: Int): Array[Float] = {
    val s = r.getSeq[Float](idx)
    val a = new Array[Float](s.length)
    var i = 0
    while (i < a.length) { a(i) = s(i); i += 1 }
    a
  }

  /** THE assignment entry every centroid-model family routes through:
    * append `(cidName: int, simName: double)` — the argmax-cosine
    * centroid and its cosine — to `df`. Dense codegen'd expression at
    * K ≤ `denseCutoff` (bit-identical to the historical plan); two-level
    * broadcast-model `mapPartitions` above it (evaluation ∝ √K per row,
    * map-only — no shuffle, no plan-literal blowup). */
  def withBestCentroid(df: DataFrame, vecCol: String, cents: Seq[Seq[Double]],
                       cidName: String = "cid", simName: String = "sim",
                       nProbe: Int = 2,
                       denseCutoff: Int = DenseCutoff): DataFrame =
    if (cents.length <= denseCutoff) {
      val b = bestDense(col(vecCol), cents, i => lit(i))
      df.withColumn("__best", b)
        .withColumn(cidName, col("__best").getField("cid"))
        .withColumn(simName, col("__best").getField("sim"))
        .drop("__best")
    } else {
      val s = df.sparkSession
      val nGroups = math.max(2, math.ceil(math.sqrt(cents.length.toDouble)).toInt)
      val model = buildModel(cents, nGroups)
      val probes = math.min(nProbe, model.coarse.length)
      val bc = s.sparkContext.broadcast(model)
      val vecIdx = df.schema.fieldIndex(vecCol)
      require(df.schema(vecIdx).dataType match {
        case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
        case _ => false
      }, s"withBestCentroid expects array<float> at $vecCol")
      val outSchema = df.schema
        .add(cidName, IntegerType, nullable = false)
        .add(simName, DoubleType, nullable = false)
      df.mapPartitions { it =>
        val m = bc.value
        it.map { r =>
          val (cid, sim) = bestTwoLevel(m, floatArrayOf(r, vecIdx), probes)
          Row.fromSeq(r.toSeq :+ cid :+ sim)
        }
      }(Encoders.row(outSchema))
    }

  /** AUTO-SIZE `nProbe` to a covering target (round-16 verdict task 4 —
    * the §8.5.4 sizing-rule discipline applied to the coarse quantizer):
    * for each sample vector, rank its coarse cells exactly as the probe
    * loop does ([[topCells]]'s (sim, gid) tie rule), find the rank of the
    * cell holding the DENSE argmax winner, and return the smallest
    * `nProbe` whose sample covering meets `target` — i.e. the empirical
    * `target`-quantile of the winner-cell rank, plus one. Cost ∝
    * sample·(C + K)·dim, driver-side at model grain (the dense argmax
    * runs per SAMPLE row only — this is the sizing pass, not the
    * assignment). A `target` of 1.0 returns a covering of the whole
    * sample, NOT a guarantee for unseen rows — the covering-vs-cost curve
    * is the IVF trade-off, and the auto-choice just pins where a
    * deployment sits on it instead of a fixed nProbe=2. */
  def nProbeForCovering(cents: Seq[Seq[Double]],
                        sample: Seq[Array[Float]],
                        target: Double = 0.95): Int = {
    require(target > 0.0 && target <= 1.0, s"covering target $target out of (0,1]")
    val nGroups = math.max(2, math.ceil(math.sqrt(cents.length.toDouble)).toInt)
    val m = buildModel(cents, nGroups)
    val c = m.coarse.length
    if (sample.isEmpty) return math.min(2, c)
    val cellOf = new Array[Int](m.cents.length)
    m.members.zipWithIndex.foreach { case (mem, g) => mem.foreach(cellOf(_) = g) }
    val ranks = sample.map { emb =>
      var na = 0.0; var i = 0
      while (i < emb.length) { na += emb(i).toDouble * emb(i).toDouble; i += 1 }
      val vNorm = math.sqrt(na)
      // dense winner (the truth the probed cells must cover)
      var bestCid = 0; var bestSim = dotFD(emb, m.cents(0)) / (vNorm * m.centNorm(0))
      i = 1
      while (i < m.cents.length) {
        val sim = dotFD(emb, m.cents(i)) / (vNorm * m.centNorm(i))
        if (better(sim, i, bestSim, bestCid)) { bestCid = i; bestSim = sim }
        i += 1
      }
      val g = cellOf(bestCid)
      // rank of g under the probe loop's ordering = # cells ranked before it
      val sims = new Array[Double](c)
      var j = 0
      while (j < c) {
        sims(j) = dotFD(emb, m.coarse(j)) / (vNorm * m.coarseNorm(j)); j += 1
      }
      var rank = 0
      j = 0
      while (j < c) {
        if (j != g && better(sims(j), j, sims(g), g)) rank += 1
        j += 1
      }
      rank
    }
    val need = math.ceil(target * sample.size).toLong
    val hist = new Array[Long](c)
    ranks.foreach(r => hist(r) += 1)
    var cum = 0L; var p = 0
    while (p < c) {
      cum += hist(p)
      if (cum >= need) return p + 1
      p += 1
    }
    c
  }

  /** [[nProbeForCovering]] over a DataFrame column: ONE bounded job
    * collects a deterministic hash-ordered sample (the learnCentroids
    * sampling discipline), then sizes driver-side. */
  def nProbeForCoveringOf(df: DataFrame, vecCol: String,
                          cents: Seq[Seq[Double]],
                          target: Double = 0.95,
                          sampleN: Int = 2048): Int = {
    val rows = df.select(col(vecCol))
      .orderBy(xxhash64(col(vecCol), lit(11)))
      .limit(sampleN).collect()
    nProbeForCovering(cents, rows.map(r => floatArrayOf(r, 0)).toSeq, target)
  }

  /** [[withBestCentroid]] with the covering-sized `nProbe` — the opt-in
    * auto knob: dense below the cutoff (covering is exact there by
    * construction, no sizing pass paid), sampled-and-sized above it. */
  def withBestCentroidCovering(df: DataFrame, vecCol: String,
                               cents: Seq[Seq[Double]],
                               cidName: String = "cid",
                               simName: String = "sim",
                               target: Double = 0.95,
                               sampleN: Int = 2048,
                               denseCutoff: Int = DenseCutoff): DataFrame =
    if (cents.length <= denseCutoff)
      withBestCentroid(df, vecCol, cents, cidName, simName,
        denseCutoff = denseCutoff)
    else
      withBestCentroid(df, vecCol, cents, cidName, simName,
        nProbe = nProbeForCoveringOf(df, vecCol, cents, target, sampleN),
        denseCutoff = denseCutoff)

  /** Test seam for the covering law: append `coveredName` — the array of
    * cids the two-level path would actually compare for each row (the
    * union of its probed cells' members). SemanticDedupSpec conditions
    * dense-equality on the dense winner being in here. */
  private[graft] def withProbedCids(df: DataFrame, vecCol: String,
                                    cents: Seq[Seq[Double]], nProbe: Int,
                                    coveredName: String): DataFrame = {
    val s = df.sparkSession
    val nGroups = math.max(2, math.ceil(math.sqrt(cents.length.toDouble)).toInt)
    val model = buildModel(cents, nGroups)
    val probes = math.min(nProbe, model.coarse.length)
    val bc = s.sparkContext.broadcast(model)
    val vecIdx = df.schema.fieldIndex(vecCol)
    val outSchema = df.schema
      .add(coveredName, ArrayType(IntegerType, containsNull = false),
        nullable = false)
    df.mapPartitions { it =>
      val m = bc.value
      it.map { r =>
        val emb = floatArrayOf(r, vecIdx)
        var na = 0.0; var i = 0
        while (i < emb.length) { na += emb(i).toDouble * emb(i).toDouble; i += 1 }
        val cells = topCells(m, emb, math.sqrt(na), probes)
        Row.fromSeq(r.toSeq :+ cells.flatMap(m.members(_)).toSeq)
      }
    }(Encoders.row(outSchema))
  }
}
