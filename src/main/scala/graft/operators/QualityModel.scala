package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PolyHash

/** Model-based quality filtering — the trained-classifier tier of the
  * curation surface (the production pattern behind FineWeb-Edu / DCLM
  * style corpus filtering: a cheap linear classifier over hashed
  * bag-of-token features scores every document, and the mix keeps the
  * high-scoring tail). The reference has no counterpart (its whole
  * surface is `processor.go`'s cardinality dataflow); this family extends
  * the §8.3 training-data pipeline the same way the Gopher gates do, one
  * rung up the quality ladder: heuristic gates → trained scorer.
  *
  * Design for the oracle AND for scale:
  *
  *  - **Features** are hashed token frequencies (`PolyHash.poly(tok,
  *    BaseA) % Dim` buckets, tf-normalized) plus ONE dense length feature
  *    `min(n_tok, 100)/100` — the hashing-trick featurizer every linear
  *    text classifier uses (Weinberger et al., ICML'09), with the repo's
  *    portable 30-bit polynomial family so the DuckDB oracle can
  *    recompute every bucket.
  *  - **Scoring is integer-exact.** Weights are quantized to MICRO-UNITS
  *    (`w_micro = round(w·1e6)`) and the whole decision statistic is the
  *    BIGINT numerator `N = 100·b·n + 100·Σ w_micro[bkt]·cnt + w_len·
  *    min(n,100)·n` — integer addition commutes, so the score is
  *    identical under ANY aggregation order (no float-accumulation-order
  *    caveat at all, the stronger cousin of the e4-floor convention), and
  *    the single trailing division `z = N/(100·n·1e6)` is one IEEE op on
  *    exactly-representable integers (|N| ≲ 1e13 < 2⁵³). `pred = N > 0`
  *    is pure integer sign. Quantized inference is also the production
  *    deployment shape (int8-style), not a test-only trick.
  *  - **Training is sample-sized, scoring is corpus-sized** — the
  *    `learnCentroids` discipline: batch gradient descent runs on a
  *    deterministic hash-split sample (each epoch = one partial-agg
  *    shuffle at feature grain, gradient collected at `Dim+2` rows to the
  *    driver), then the quantized model scores any corpus through the
  *    SAME shared path as the literal twin. At 100 TB: train on the
  *    sample, score map-side — the scoring join broadcasts a vocab→bucket
  *    table derived from the corpus vocabulary (unigramLogProb's
  *    vocab-grain convention) and the weight lookup is a literal array
  *    `element_at`, so no shuffle grows with the corpus beyond the
  *    per-doc aggregation.
  *
  * Correctness tiers (the float-model twin pattern, §8.6):
  *  - `q_text_quality_lr_lit` ● — LITERAL micro-unit weights through the
  *    full scoring path (hashing, bucket join, integer dot, division),
  *    DuckDB-oracled end to end.
  *  - `q_text_quality_lr` ○ [float-model] — weights trained by gradient
  *    descent on the gate corpus (weak labels: the heuristic
  *    `quality ≥ 0.5` median split from [[TextAnalysis.qualityCol]]),
  *    then quantized into the same scoring path; bounded by
  *    QualityModelSpec (held-out accuracy ≥ floor, loss decreases,
  *    quantized ≡ double scoring up to quantization error).
  */
object QualityModel {

  private def docs(s: SparkSession, dir: String) = Tables(s, dir, "documents")
  private val tokens: Column = split(col("text"), " ")

  /** Hashed-feature dimensionality. 2¹⁰ buckets ≈ 5× this corpus's
    * vocabulary-collision comfort at gate scale; a deployment raises it
    * (the weights table stays a driver array until ~2²⁴). */
  val Dim = 1024
  /** Micro-unit scale for quantized weights. */
  val WScale = 1000000L
  /** Index of the dense length feature (one past the hashed buckets). */
  val LenIdx: Int = Dim

  /** Token → feature bucket, the oracle-portable hash. */
  def bucketOf(tok: String): Long = PolyHash.poly(tok, PolyHash.BaseA) % Dim

  /** The vocab→bucket table both scoring and featurization join through:
    * imperative hashing at VOCABULARY grain (one typed map row per
    * DISTINCT token — the tokenFreqCmsPoly convention), checkpointed so
    * the distinct runs once, and broadcast only under the library's 2M
    * convention ([[IndexFamily.maybeBroadcast]]) — a 100 TB corpus's
    * vocabulary is NOT assumed to fit an executor; past the bound the
    * join falls back to a keyed shuffle on `tok`, which is also the
    * unigramLogProb shape. */
  private def vocabBuckets(s: SparkSession, tok: DataFrame): DataFrame = {
    import s.implicits._
    val vocab = graft.Checkpoints.local(
      tok.select(col("tok")).distinct()
        .as[String].map(t => (t, bucketOf(t))).toDF("tok", "bkt"))
    IndexFamily.maybeBroadcast(vocab, vocab.count())
  }

  // -------------------------------------------------------------------
  // Shared scoring path (literal twin AND trained tier both run this)
  // -------------------------------------------------------------------

  /** Score every document with a micro-unit model: output
    * `(doc_id, n_tok, z_e4, pred)` where
    * `z = b + Σ_b w[b]·cnt[b]/n + w[LenIdx]·min(n,100)/100`, computed
    * through the integer numerator described in the object doc.
    *
    * Plan shape: one explode at token grain, a vocab-grain typed map for
    * the bucket hash (imperative hashing at VOCABULARY grain — the
    * tokenFreqCmsPoly convention), a broadcast vocab→bucket join back,
    * then one partial+final aggregation per doc. No shuffle is ∝ anything
    * but the corpus's token count; the weight array rides the plan as a
    * literal (`element_at`), never a join. */
  def scoreWithMicro(s: SparkSession, docsDf: DataFrame,
                     wMicro: Array[Long], biasMicro: Long): DataFrame = {
    import s.implicits._
    require(wMicro.length == Dim + 1,
      s"micro model must carry $Dim hashed buckets + 1 length weight")
    val tok = docsDf.select(col("doc_id"), explode(tokens).as("tok"))
    val wArr = typedlit(wMicro.take(Dim).toSeq)
    val perDoc = tok.join(vocabBuckets(s, tok), Seq("tok"))
      .select(col("doc_id"),
        element_at(wArr, (col("bkt") + 1).cast("int")).as("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("w")).as("dot_micro"), count(lit(1)).as("n_tok"))
    val n = col("n_tok")
    val numer = lit(100L) * lit(biasMicro) * n + lit(100L) * col("dot_micro") +
      lit(wMicro(LenIdx)) * least(n, lit(100L)) * n
    perDoc.select(
      col("doc_id"), n,
      round(numer.cast("double") / (n * lit(100L * WScale)).cast("double"), 4)
        .as("z_e4"),
      (numer > 0L).as("pred"))
  }

  /** DuckDB twin of [[scoreWithMicro]]: same literal weights, same
    * vocab-grain polynomial hash, same integer numerator, same single
    * trailing division. */
  def scoreWithMicroSql(wMicro: Array[Long], biasMicro: Long): String = {
    import PolyHash.{BaseA, Mod}
    val wList = wMicro.take(Dim).mkString("[", ", ", "]")
    val wLen = wMicro(LenIdx)
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |vb AS (
       |  SELECT tok,
       |    list_reduce(list_prepend(0::BIGINT,
       |      [ascii(x)::BIGINT for x in regexp_split_to_array(tok, '')]),
       |      (a, c) -> (a * $BaseA + c) % $Mod) % $Dim AS bkt
       |  FROM (SELECT DISTINCT tok FROM tok)),
       |w AS (
       |  SELECT i AS bkt, wl[i + 1] AS wm
       |  FROM range($Dim) t(i), (SELECT $wList::BIGINT[] AS wl)),
       |perdoc AS (
       |  SELECT t.doc_id, CAST(sum(w.wm) AS BIGINT) AS dot_micro,
       |         count(*) AS n_tok
       |  FROM tok t JOIN vb USING (tok) JOIN w USING (bkt)
       |  GROUP BY 1)
       |SELECT doc_id, n_tok,
       |  round((100 * $biasMicro * n_tok + 100 * dot_micro
       |         + $wLen * least(n_tok, 100) * n_tok)::DOUBLE
       |        / (n_tok * ${100L * WScale})::DOUBLE, 4) AS z_e4,
       |  (100 * $biasMicro * n_tok + 100 * dot_micro
       |   + $wLen * least(n_tok, 100) * n_tok) > 0 AS pred
       |FROM perdoc""".stripMargin
  }

  /** The literal twin's fixed model: a deterministic LCG-mixed weight
    * array (the gate exercises the SCORING path — hashing, join, integer
    * dot, division — under arbitrary weights; the trained tier supplies
    * meaningful ones). */
  def literalMicroModel: (Array[Long], Long) = {
    val w = Array.tabulate(Dim + 1) { i =>
      val m = (i.toLong * 2654435761L + 12345L) % (2L * WScale + 1L)
      m - WScale
    }
    (w, 250000L)
  }

  def scoreLiteralQuery(s: SparkSession, dir: String): DataFrame = {
    val (w, b) = literalMicroModel
    scoreWithMicro(s, docs(s, dir), w, b)
  }

  def scoreLiteralSql: String = {
    val (w, b) = literalMicroModel
    scoreWithMicroSql(w, b)
  }

  // -------------------------------------------------------------------
  // Training (sample-sized, double-precision, then quantized)
  // -------------------------------------------------------------------

  /** Double-precision model: `w(0..Dim-1)` hashed-bucket weights,
    * `w(LenIdx)` the length-feature weight, plus bias. */
  final case class LrModel(w: Array[Double], bias: Double) {
    def quantized: (Array[Long], Long) =
      (w.map(x => Math.round(x * WScale)), Math.round(bias * WScale))
  }

  /** Featurize to `(doc_id, bkt, x)` long format: tf-normalized hashed
    * buckets plus the dense length feature at [[LenIdx]]. */
  private[operators] def features(s: SparkSession, docsDf: DataFrame): DataFrame = {
    val tok = docsDf.select(col("doc_id"), explode(tokens).as("tok"))
    val n = count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id")))
    val tf = tok.join(vocabBuckets(s, tok), Seq("tok"))
      .select(col("doc_id"), col("bkt"), (lit(1.0) / n).as("x"))
      .groupBy(col("doc_id"), col("bkt")).agg(sum(col("x")).as("x"))
    val lenFeat = docsDf.select(col("doc_id"), lit(LenIdx.toLong).as("bkt"),
      (least(size(tokens), lit(100)).cast("double") / lit(100.0)).as("x"))
    tf.unionByName(lenFeat)
  }

  /** Internal bias pseudo-feature index: x = 1 for every doc, so ONE
    * gradient aggregation covers every weight AND the bias, and the loss
    * rides the bias row's second aggregate (its x = 1 rows span all
    * docs). */
  private val BiasIdx: Int = Dim + 1

  /** Batch gradient descent on logistic loss. `labels` is `(doc_id, y)`
    * with y ∈ {0,1}; each epoch is ONE distributed aggregation (the
    * scoring join and the gradient groupBy fuse into a single job; the
    * gradient table collected at Dim+2 rows). Deterministic up to float
    * accumulation order — the trained tier is a §8.6 [float-model] row;
    * its GATE rides the literal twin's shared scoring path. */
  def train(s: SparkSession, docsDf: DataFrame, labels: DataFrame,
            epochs: Int = 16, lr: Double = 4.0): (LrModel, Array[Double]) = {
    val lab = labels.select(col("doc_id"), col("y").cast("double").as("y"))
    val feats = graft.Checkpoints.local(
      features(s, docsDf)
        .unionByName(docsDf.select(col("doc_id"), lit(BiasIdx.toLong).as("bkt"),
          lit(1.0).as("x")))
        .join(lab, Seq("doc_id")))
    val nDocs = docsDf.count().toDouble
    var w = new Array[Double](Dim + 2) // hashed ++ length ++ bias
    val losses = new Array[Double](epochs)
    (0 until epochs).foreach { ep =>
      val wArr = typedlit(w.toSeq)
      val z = feats
        .groupBy(col("doc_id"), col("y"))
        .agg(sum(element_at(wArr, (col("bkt") + 1).cast("int")) * col("x")).as("z"))
      val err = z.select(col("doc_id"),
        (lit(1.0) / (lit(1.0) + exp(-col("z"))) - col("y")).as("e"),
        (-col("y") * col("z") +
          when(col("z") > 0, col("z") + log(lit(1.0) + exp(-col("z"))))
            .otherwise(log(lit(1.0) + exp(col("z"))))).as("l"))
      // one job: per-bucket gradient; the loss mean rides the bias row
      val gradRows = feats.join(err, Seq("doc_id"))
        .groupBy(col("bkt"))
        .agg((sum(col("e") * col("x")) / lit(nDocs)).as("g"),
             (sum(col("l")) / lit(nDocs)).as("lbar"))
        .collect()
      val w2 = w.clone()
      gradRows.foreach { r =>
        val b = r.getLong(0).toInt
        w2(b) = w2(b) - lr * r.getDouble(1)
        if (b == BiasIdx) losses(ep) = r.getDouble(2)
      }
      w = w2
    }
    graft.Checkpoints.release(feats)
    (LrModel(w.take(Dim + 1), w(BiasIdx)), losses)
  }

  /** Weak labels for the registered demonstration: the heuristic quality
    * score's ≥ 0.5 split ([[TextAnalysis.qualityCol]]) — balanced on the
    * gate corpus; any `(doc_id, y)` frame (human labels, an LLM judge's
    * output, reference-vs-crawl) plugs in the same way. */
  def weakLabels(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      (TextAnalysis.qualityCol(col("text")) >= 0.5).cast("int").as("y"))

  /** The trained tier's hard training-set cap: a 20 % hash fraction alone
    * is CORPUS-proportional (16 GD epochs × feature-grain shuffle over it
    * would be ~3.2 corpus-scale passes at any size — round-14 verdict),
    * so the fraction is clamped to a fixed SIZE by a deterministic
    * hash-order limit, the [[Similarity.learnCentroids]] discipline:
    * TakeOrderedAndProject per-partition heaps, no global sort. At gate
    * scale the cap never binds (sf0.1 is ~1 000 sampled docs), so the
    * demonstration's behavior is unchanged; at 100 TB the gradient
    * passes touch exactly this many docs, full stop. */
  val MaxTrainDocs = 65536

  /** The trained tier's training docs: the 20 % hash slice under the
    * [[MaxTrainDocs]]-class clamp. Hash-ORDERED limit, so the selection
    * is deterministic and caps nest (cap-16's docs ⊂ cap-32's — a
    * budget bump only ADDS training data, never reshuffles it). */
  private[graft] def trainSample(s: SparkSession, dir: String,
                                 cap: Int = MaxTrainDocs): DataFrame = {
    import graft.operators.Sampling.{IdMod, Mix}
    val sampleKey = pmod(pmod(col("doc_id"), lit(IdMod)) * lit(Mix), lit(IdMod)) % 100
    val sampled = docs(s, dir).where(sampleKey < 20)
    // gate the limit pass on a count (round-16, closing the r15 anchor
    // regression): whether the cap binds is ONE column-pruned doc_id
    // count, while the TakeOrdered pass it gates carries full rows (text
    // included) through per-partition heaps and a driver-side merge — and
    // the trained query consumes this frame three times (features,
    // labels join, scoring), so the un-gated clamp paid that merge
    // thrice at gate scale where it never binds. When the count is at or
    // under the cap the plain filtered frame IS the capped selection
    // (same set; the hash order only chooses which docs DROP).
    if (sampled.select(col("doc_id")).count() <= cap) sampled
    else sampled
      .orderBy(xxhash64(col("doc_id"), lit(15)), col("doc_id"))
      .limit(cap)
  }

  /** Trained tier: GD on a deterministic 20 % hash sample of the corpus
    * CLAMPED to [[MaxTrainDocs]] (training is FIXED-size, scoring is
    * CORPUS-sized — the learnCentroids discipline, and the literal
    * reason this tier scales: at 100 TB the gradient passes touch a
    * fixed-size sample while the scoring pass is one map-shaped sweep),
    * quantized, scored through the SHARED gated path, label joined back
    * for inspection. */
  def scoreTrainedQuery(s: SparkSession, dir: String): DataFrame = {
    val trainDocs = trainSample(s, dir)
    val (model, _) = train(s, trainDocs,
      weakLabels(s, dir).join(trainDocs.select("doc_id"), Seq("doc_id")))
    val (wq, bq) = model.quantized
    scoreWithMicro(s, docs(s, dir), wq, bq)
      .join(weakLabels(s, dir), Seq("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_quality_lr_lit" -> (scoreLiteralQuery _),
    "q_text_quality_lr" -> (scoreTrainedQuery _))

  val oracles: Map[String, String] = Map(
    "q_text_quality_lr_lit" -> scoreLiteralSql)
}
