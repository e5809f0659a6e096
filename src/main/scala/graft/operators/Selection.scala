package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PolyHash

/** Data selection for LLM training mixes — the two published families a
  * curation pipeline runs between the heuristic gates and the sampler:
  *
  *  - **DSIR** (Xie et al., "Data Selection for Language Models via
  *    Importance Resampling", NeurIPS 2023): estimate hashed-n-gram bag
  *    models of a TARGET distribution (here: the `lang = 'en'` slice, the
  *    stand-in for "looks like Wikipedia") and of the RAW corpus, score
  *    every document by its log importance weight
  *    `log w(x) = Σ_features log(p_target[bkt] / p_raw[bkt])`, then
  *    resample top-k under deterministic Gumbel noise — the paper's
  *    Gumbel-top-k trick, made reproducible by deriving the noise from
  *    the repo's splitmix id hash instead of an RNG.
  *  - **Stupid-backoff bigram LM scoring** (Brants et al., "Large
  *    Language Models in Machine Translation", EMNLP 2007 — the scoring
  *    rung of the CCNet/CC-100 perplexity filter): train bigram/unigram
  *    counts on the reference slice, score every document's transitions
  *    with `S(w2|w1) = c(w1 w2)/c(w1)`, backing off to `0.4·c(w2)/N` for
  *    unseen bigrams and to `0.4²/N` for out-of-vocabulary tokens.
  *
  * The reference (`processor.go`) has no counterpart — this extends the
  * §8.3 training-data surface one rung past the trained classifier
  * ([[QualityModel]]): gates → classifier → distribution matching.
  *
  * Oracle-portability design (shared with [[QualityModel]], one notch
  * stronger): every transcendental is evaluated ONCE per MODEL row
  * (bucket / bigram / unigram — never per occurrence; the one exception
  * is the per-document Gumbel key, whose honest boundary note lives on
  * [[gumbelKeyCol]]) and immediately
  * quantized to integer micro-units with `floor(x·10⁶ + 0.5)` (the
  * [[TextAnalysis.tfidfTopTerms]] parity rule — `round()` disagrees
  * between Spark's HALF_UP and DuckDB's half-even at representable
  * midpoints; a floored transcendental never lands on one). Per-document
  * scores are then BIGINT sums of those micro-units — integer addition
  * commutes, so the decision statistic is exact under any aggregation
  * order, and the hash gate compares integers end to end.
  *
  * Deployment shape ([[buildSelectionModel]] / [[scoreWithStoredModel]]):
  * train ONCE on a reference corpus, persist the model (2 048 DSIR
  * bucket weights, the bigram/unigram LM tables, a meta handshake with
  * the offline admission threshold), then score every arriving batch
  * map-side against the frozen model — the
  * [[graft.streaming.StreamSelect]] leg runs exactly this per
  * micro-batch. Scoring a batch never re-reads the training corpus.
  *
  * Scale shape (100 TB):
  *  - DSIR's model is TWO aggregations down to [[DsirDim]] bucket rows
  *    (collected driver-side — the learnCentroids discipline; a
  *    deployment estimates them on a hash sample, `Sampling.hashPct`),
  *    and scoring is map-shaped: tokenize, hash, `element_at` into a
  *    literal micro-weight array, one partial+final agg per doc. The only
  *    corpus-sized shuffle is the per-doc aggregation itself.
  *  - The Gumbel resample is `TakeOrderedAndProject` (per-partition
  *    top-k, k rows to the driver) — never a global sort; the ONLINE
  *    variant is the persisted `key_threshold_micro` (the k-th key of
  *    the offline resample) applied as a map-side filter.
  *  - The bigram LM's model tables live at model grain (distinct bigrams
  *    / vocab) and join the corpus under the library's 2 M broadcast
  *    convention ([[IndexFamily.maybeBroadcast]]) with a keyed-shuffle
  *    fallback — a 100 TB corpus's bigram table is NOT assumed to fit an
  *    executor.
  */
object Selection {

  private def docs(s: SparkSession, dir: String) = Tables(s, dir, "documents")

  /** The target-distribution slice both models treat as "reference text"
    * (CCNet's Wikipedia stand-in on this corpus). */
  val TargetLang = "en"

  /** Brants cutoff the DEPLOYMENT stored-model paths default to — see
    * the note at the object foot for the full pricing rationale. */
  val StoredModelMinCount = 2L

  // -------------------------------------------------------------------
  // DSIR — hashed-n-gram importance resampling
  // -------------------------------------------------------------------

  /** Hashed feature space for the bag models: unigrams ∪ bigrams into
    * 2¹¹ buckets (the paper uses 10⁴ over the same feature set; 2 048
    * keeps collisions comfortable at gate scale and the micro-weight
    * array a plan literal — a deployment raises it until ~2²⁴). */
  val DsirDim = 2048

  /** Feature → bucket, the oracle-portable polynomial hash (BaseB keeps
    * this family independent of [[QualityModel.bucketOf]]'s BaseA). */
  def dsirBucket(feat: String): Long = PolyHash.poly(feat, PolyHash.BaseB) % DsirDim

  /** `(doc_id, is_target, bkt)` at feature-OCCURRENCE grain: every
    * unigram and every space-joined bigram, hashed imperatively in one
    * map-side typed flatMap (the [[Dedup.dupNgramStats]] idiom — the
    * array HOF route is interpreted in Spark 4.1, a measured 4.8 s/5k-doc
    * tax this path avoids). Expects `(doc_id, lang, text)`; no shuffle. */
  private def featureBucketsOf(s: SparkSession, df: DataFrame): DataFrame = {
    import s.implicits._
    df.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .flatMap { case (id, lang, text) =>
        val t = if (lang == TargetLang) 1L else 0L
        val w = text.split(" ", -1)
        val uni = w.iterator.map(f => (id, t, dsirBucket(f)))
        val bi = (0 until w.length - 1).iterator
          .map(i => (id, t, dsirBucket(w(i) + " " + w(i + 1))))
        uni ++ bi
      }.toDF("doc_id", "is_target", "bkt")
  }

  /** Laplace-smoothed per-bucket log importance ratio in micro-units:
    * `floor((ln(ct+1) − ln(T+B) − ln(cr+1) + ln(R+B))·10⁶ + 0.5)` —
    * EXACTLY this operand order, mirrored character-for-character in the
    * oracle SQL so both engines fold the same IEEE additions around their
    * (≤1 ulp apart) `ln`. A bucket unseen in the model corpus gets the
    * pure smoothing ratio (`ln(1) = 0` exactly in both engines). */
  private def lrMicro(ct: Long, cr: Long, tTot: Long, rTot: Long): Long =
    math.floor((math.log(ct + 1L) - math.log(tTot + DsirDim)
      - math.log(cr + 1L) + math.log(rTot + DsirDim)) * 1e6 + 0.5).toLong

  /** The full [[DsirDim]]-slot micro-weight array estimated from a model
    * corpus `(doc_id, lang, text)` — two aggregations to B collected rows
    * (the learnCentroids discipline: the MODEL is driver-sized; at
    * deployment it is estimated on a hash sample of the raw pool). */
  private[graft] def dsirModelOf(s: SparkSession, modelDocs: DataFrame): Array[Long] = {
    val counts = featureBucketsOf(s, modelDocs).groupBy(col("bkt"))
      .agg(count(lit(1)).as("cr"), sum(col("is_target")).as("ct"))
      .collect()
    val cr = new Array[Long](DsirDim)
    val ct = new Array[Long](DsirDim)
    counts.foreach { r =>
      val b = r.getLong(0).toInt
      cr(b) = r.getLong(1); ct(b) = r.getLong(2)
    }
    val rTot = cr.sum; val tTot = ct.sum
    Array.tabulate(DsirDim)(b => lrMicro(ct(b), cr(b), tTot, rTot))
  }

  /** Score `(doc_id, lang, text)` docs under a micro-weight array:
    * `(doc_id, n_feat, dsir_micro)`. Map-shaped — the weights ride the
    * plan as a literal (`element_at`), never a join. */
  private def scoreDsirWith(s: SparkSession, df: DataFrame, lr: Array[Long]): DataFrame =
    featureBucketsOf(s, df).groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feat"),
           sum(element_at(typedlit(lr.toSeq), (col("bkt") + 1).cast("int")))
             .as("dsir_micro"))

  /** Per-document DSIR log importance weight over a corpus dir, model
    * estimated from the same corpus (the paper's raw pool = the corpus
    * itself): `(doc_id, n_feat, dsir_micro)`. */
  def dsirScores(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    scoreDsirWith(s, d, dsirModelOf(s, d))
  }

  /** How many documents the resample keeps (the paper's k; 20 % of the
    * sf0.01 gate corpus). A fixed k — not a fraction — is the published
    * semantics: "select k examples from the raw pool". */
  val DsirK = 100

  /** The derandomized Gumbel sampling key in micro-units:
    * `dsir_micro + floor(−ln(−ln(u))·10⁶ + 0.5)` with
    * `u = (splitmix(doc_id)+1)/(IdMod+1)` — an exact rational both
    * engines turn into the identical double, so the key is a BIGINT and
    * selection order is integer. Honesty note: unlike the model-grain
    * quantizations, the nested `ln` here evaluates once per DOCUMENT (it
    * is a function of `doc_id` — there is no model grain to hoist it to),
    * so this floor carries the same per-row ≤1-ulp boundary exposure as
    * the hash-gated `q_text_tfidf` score (`floor(tf·ln(N/df)·10⁴+0.5)`
    * per (doc, tok) row — the accepted precedent): a key within ~1e-9 of
    * an integer boundary could flip by 1 between engines. If a testdata
    * regen ever lands a doc there, the gate protocol is the tfidf one —
    * demote to rows-only with the boundary documented, not an algorithm
    * bug. */
  private def gumbelKeyCol(dsirMicro: Column, docId: Column): Column = {
    import graft.operators.Sampling.{IdMod, Mix}
    val h = pmod(pmod(docId, lit(IdMod)) * lit(Mix), lit(IdMod))
    val u = (h + lit(1L)).cast("double") / lit((IdMod + 1L).toDouble)
    dsirMicro + floor(-log(-log(u)) * lit(1e6) + lit(0.5)).cast("long")
  }

  /** Gumbel-top-k importance resample, derandomized. Plan:
    * `TakeOrderedAndProject` — k rows cross the wire, never a sort of
    * the corpus. */
  def dsirGumbelTopK(s: SparkSession, dir: String, k: Int = DsirK): DataFrame =
    dsirScores(s, dir)
      .withColumn("key_micro", gumbelKeyCol(col("dsir_micro"), col("doc_id")))
      .orderBy(col("key_micro").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("n_feat"), col("dsir_micro"), col("key_micro"))

  // -------------------------------------------------------------------
  // Stupid-backoff bigram LM scoring (the CCNet filter's scoring rung)
  // -------------------------------------------------------------------

  /** Brants' backoff discount. */
  private val Alpha = 0.4

  /** `(doc_id, lang, w1, w2)` at transition grain — map-side typed
    * flatMap, same idiom as the DSIR featurizer. */
  private def transitionsOf(s: SparkSession, df: DataFrame): DataFrame = {
    import s.implicits._
    df.select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .flatMap { case (id, lang, text) =>
        val w = text.split(" ", -1)
        (0 until w.length - 1).iterator.map(i => (id, lang, w(i), w(i + 1)))
      }.toDF("doc_id", "lang", "w1", "w2")
  }

  /** The LM model tables estimated from a model corpus's [[TargetLang]]
    * slice: `(bigram table (w1, w2, bg_micro), unigram table
    * (w2, ug_micro), N)` — each tier's log-score quantized at MODEL
    * grain.
    *
    * `minCount` is Brants' count cutoff (round-14 verdict task 4):
    * bigrams seen fewer than `minCount` times are PRUNED from the model —
    * a pruned transition simply falls to the unigram tier at scoring
    * time, which IS stupid-backoff's unseen-bigram rule, so pruning only
    * moves scores through the documented backoff path (SelectionSpec pins
    * it against a driver-side recomputation). This is what bounds the
    * model at a 100 TB reference slice: the raw bigram table is
    * corpus-shaped (heavy-tailed singletons), the pruned one is
    * vocabulary-shaped; §8.5.14 prices rows vs minCount. The default 1
    * prunes nothing — bit-identical to the historical model. The unigram
    * tier is never pruned (it is the backoff floor and already bounded by
    * the vocabulary). */
  private[graft] def sbackoffModelOf(s: SparkSession, modelDocs: DataFrame,
                                     minCount: Long = 1L):
      (DataFrame, DataFrame, Long) = {
    val refToks = modelDocs.where(col("lang") === TargetLang)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    // checkpointed: uni is consumed FOUR ways (the nTot action here, the
    // bigram join below, the ugm projection, and the callers' count for
    // the broadcast decision) — un-checkpointed, each re-runs the
    // reference-slice tokenize+aggregate (the requireNewIds review-finding
    // class); same for bgm, which the scorer both counts and joins
    val uni = graft.Checkpoints.local(
      refToks.groupBy(col("tok")).agg(count(lit(1)).as("c1")))
    val nTot = uni.agg(coalesce(sum(col("c1")), lit(0L))).head().getLong(0)
    require(nTot > 0,
      s"model corpus has no '$TargetLang' tokens — the backoff LM (and the " +
        "selection-model threshold) need a non-empty reference slice")
    val bgm = graft.Checkpoints.local(
      transitionsOf(s, modelDocs).where(col("lang") === TargetLang)
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
        .where(col("c2") >= lit(minCount))
        .join(uni.withColumnRenamed("tok", "w1"), Seq("w1"))
        .select(col("w1"), col("w2"),
          floor((log(col("c2")) - log(col("c1"))) * lit(1e6) + lit(0.5))
            .cast("long").as("bg_micro")))
    val ugm = uni.select(col("tok").as("w2"),
      floor((log(lit(Alpha)) + log(col("c1")) - log(lit(nTot))) * lit(1e6)
        + lit(0.5)).cast("long").as("ug_micro"))
    (bgm, ugm, nTot)
  }

  /** The OOV floor `ln(α·α/N)` in micro-units — one transcendental,
    * computed once (both engines fold the identical expression). */
  private[graft] def oovMicroOf(nTot: Long): Long =
    math.floor((math.log(Alpha) + math.log(Alpha) - math.log(nTot)) * 1e6 + 0.5).toLong

  /** Score `(doc_id, lang, text)` docs under frozen LM tables: per-doc
    * BIGINT sums + integer tier diagnostics, total over the input (a
    * sub-2-token doc scores 0 with 0 transitions). */
  private def scoreSbackoffWith(s: SparkSession, df: DataFrame,
                                bgm: DataFrame, ugm: DataFrame,
                                oovMicro: Long,
                                bgmRows: Long, ugmRows: Long): DataFrame = {
    val scored = transitionsOf(s, df)
      .join(IndexFamily.maybeBroadcast(bgm, bgmRows), Seq("w1", "w2"), "left")
      .join(IndexFamily.maybeBroadcast(ugm, ugmRows), Seq("w2"), "left")
      .select(col("doc_id"),
        coalesce(col("bg_micro"), col("ug_micro"), lit(oovMicro)).as("sc"),
        col("bg_micro").isNotNull.cast("long").as("hit_bg"),
        (col("bg_micro").isNull && col("ug_micro").isNull).cast("long").as("is_oov"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trans"), sum(col("hit_bg")).as("n_bg_hit"),
           sum(col("is_oov")).as("n_oov"), sum(col("sc")).as("sb_micro"))
    df.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trans"), lit(0L)).as("n_trans"),
        coalesce(col("n_bg_hit"), lit(0L)).as("n_bg_hit"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("sb_micro"), lit(0L)).as("sb_micro"))
  }

  /** Score every document of a corpus dir under the LM trained on the
    * same corpus's [[TargetLang]] slice: `(doc_id, n_trans, n_bg_hit,
    * n_oov, sb_micro)` — low `sb_micro/n_trans` is the CCNet "tail"
    * (discard or down-weight); `n_oov` exposes the vocabulary miss rate
    * that makes non-reference-language docs score low. */
  def sbackoffScores(s: SparkSession, dir: String,
                     minCount: Long = 1L): DataFrame = {
    val d = docs(s, dir)
    val (bgm, ugm, nTot) = sbackoffModelOf(s, d, minCount)
    scoreSbackoffWith(s, d, bgm, ugm, oovMicroOf(nTot), bgm.count(), ugm.count())
  }

  // -------------------------------------------------------------------
  // Persisted model + frozen-model scoring (the deployment shape)
  // -------------------------------------------------------------------

  /** Train the complete selection model on `modelDocs` and persist it:
    *
    *  - `dsir.parquet` — all [[DsirDim]] bucket micro-weights;
    *  - `lm_bigram.parquet` / `lm_unigram.parquet` — the backoff tables;
    *  - `meta.parquet` — the handshake `(dim, target_lang, n_tot,
    *    oov_micro, key_threshold_micro, key_threshold_doc_id)`: a scorer
    *    built under different hyperparameters refuses loudly (the
    *    [[Dedup.buildMinhashIndex]] convention), and the threshold pair —
    *    the BOUNDARY ROW (k-th Gumbel key + its doc_id) of the offline
    *    resample over the model corpus — is the ONLINE admission rule:
    *    a frozen threshold is how a stream applies "top-k of the pool"
    *    to documents it hasn't seen yet, and carrying the boundary
    *    doc_id makes admission tie-break exactly as the offline top-k.
    *
    * Train-once cost: the two DSIR aggregations, the LM aggregations,
    * and one `TakeOrderedAndProject` for the threshold. */
  def buildSelectionModel(s: SparkSession, modelDocs: DataFrame,
                          modelDir: String, k: Int = DsirK,
                          minCount: Long = StoredModelMinCount): Unit = {
    import s.implicits._
    val lr = dsirModelOf(s, modelDocs)
    lr.zipWithIndex.map { case (m, b) => (b.toLong, m) }.toSeq
      .toDF("bkt", "lr_micro")
      .coalesce(1).write.mode("overwrite").parquet(s"$modelDir/dsir.parquet")
    val (bgm, ugm, nTot) = sbackoffModelOf(s, modelDocs, minCount)
    bgm.write.mode("overwrite").parquet(s"$modelDir/lm_bigram.parquet")
    ugm.write.mode("overwrite").parquet(s"$modelDir/lm_unigram.parquet")
    // the threshold is the BOUNDARY ROW of the offline top-k (its k-th
    // row under key desc, doc_id asc), not just the k-th key: admission
    // tie-breaks on doc_id exactly as the offline resample does, so a tie
    // at the threshold key admits the SAME set, never a superset
    // (round-14 advice)
    val bnd = scoreDsirWith(s, modelDocs, lr)
      .withColumn("key_micro", gumbelKeyCol(col("dsir_micro"), col("doc_id")))
      .orderBy(col("key_micro").desc, col("doc_id")).limit(k)
      .orderBy(col("key_micro"), col("doc_id").desc).limit(1)
      .select(col("key_micro"), col("doc_id")).head()
    Seq((DsirDim, TargetLang, nTot, oovMicroOf(nTot), bnd.getLong(0), bnd.getLong(1),
         minCount))
      .toDF("dim", "target_lang", "n_tot", "oov_micro",
        "key_threshold_micro", "key_threshold_doc_id", "min_count")
      .coalesce(1).write.mode("overwrite").parquet(s"$modelDir/meta.parquet")
    storedModelMemo.remove(modelDir) // a retrain invalidates the memo
  }

  /** The driver-resident part of a stored model, memoized per model dir:
    * the weight array, thresholds, and the LM table row counts (so a
    * long-running stream pays the loads ONCE, not per micro-batch — a
    * retrain under a live scorer must call [[buildSelectionModel]] in
    * the same JVM, which invalidates, or restart the stream). */
  private final case class StoredModel(lr: Array[Long], nTot: Long,
                                       oovMicro: Long, thrMicro: Long,
                                       thrDocId: Long,
                                       bgmRows: Long, ugmRows: Long,
                                       minCount: Long)
  private val storedModelMemo =
    new java.util.concurrent.ConcurrentHashMap[String, StoredModel]()

  private def loadStoredModel(s: SparkSession, modelDir: String): StoredModel =
    storedModelMemo.computeIfAbsent(modelDir, _ => {
      val meta = s.read.parquet(s"$modelDir/meta.parquet").head()
      require(meta.getInt(0) == DsirDim && meta.getString(1) == TargetLang,
        s"selection model at $modelDir built with (dim,target)=" +
          s"(${meta.getInt(0)},${meta.getString(1)}); this scorer uses " +
          s"($DsirDim,$TargetLang) — rebuild the model")
      require(meta.length >= 6,
        s"selection model at $modelDir carries a ${meta.length}-field meta " +
          "(pre-threshold-boundary-row format) — rebuild the model")
      val rows = s.read.parquet(s"$modelDir/dsir.parquet").collect()
      require(rows.length == DsirDim,
        s"selection model at $modelDir carries ${rows.length} buckets, expected $DsirDim")
      val lr = new Array[Long](DsirDim)
      rows.foreach(r => lr(r.getLong(0).toInt) = r.getLong(1))
      StoredModel(lr, meta.getLong(2), meta.getLong(3), meta.getLong(4),
        meta.getLong(5),
        s.read.parquet(s"$modelDir/lm_bigram.parquet").count(),
        s.read.parquet(s"$modelDir/lm_unigram.parquet").count(),
        // pre-round-16 models carry no cutoff column: they were built
        // unpruned (the historical minCount=1)
        if (meta.length >= 7) meta.getLong(6) else 1L)
    }) match {
      case m =>
        // the handshake CONSULTED, not write-only (round-16 advice): a
        // corrupt cutoff refuses loudly, and the served model's pruning
        // discipline is announced once per JVM per modelDir — the "scorer
        // can always tell what model it serves" promise made observable
        require(m.minCount >= 1L,
          s"selection model at $modelDir carries min_count=${m.minCount} " +
            "(must be >= 1) — meta is corrupt, rebuild the model")
        if (announcedModels.add(modelDir))
          System.err.println(s"[graft] scoreWithStoredModel: serving $modelDir " +
            s"(min_count=${m.minCount}, " +
            s"${if (m.minCount > 1L) "Brants-pruned" else "unpruned"}; " +
            s"${m.bgmRows} bigram / ${m.ugmRows} unigram rows)")
        m
    }

  private val announcedModels =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** The stored model's persisted Brants cutoff — the meta handshake's
    * public read side (specs pin the build→serve round-trip with it). */
  def storedModelMinCount(s: SparkSession, modelDir: String): Long =
    loadStoredModel(s, modelDir).minCount

  /** Score a batch `(doc_id, text)` against the FROZEN model at
    * `modelDir` — the at-ingest scorer ([[graft.streaming.StreamSelect]]
    * runs this per micro-batch). Output per doc: both scores, the Gumbel
    * key, the threshold admission, and the LM tier diagnostics. Pure
    * map-shaped per batch: weights are a plan literal, LM tables join
    * under the 2 M broadcast convention, NOTHING re-reads the training
    * corpus, and the only shuffles are the two per-doc aggregations at
    * batch grain. */
  def scoreWithStoredModel(s: SparkSession, batch: DataFrame,
                           modelDir: String): DataFrame = {
    val m = loadStoredModel(s, modelDir)
    val withLang = batch.select(col("doc_id"), lit("").as("lang"), col("text"))
    val dsir = scoreDsirWith(s, withLang, m.lr)
      .withColumn("key_micro", gumbelKeyCol(col("dsir_micro"), col("doc_id")))
      // strictly-above admits; AT the threshold key the offline top-k's
      // doc_id tie-break applies, so a key tie never admits >k of the
      // build pool (round-14 advice — the boundary row rides the meta)
      .withColumn("admitted", col("key_micro") > lit(m.thrMicro) ||
        (col("key_micro") === lit(m.thrMicro) &&
          col("doc_id") <= lit(m.thrDocId)))
    val bgm = s.read.parquet(s"$modelDir/lm_bigram.parquet")
    val ugm = s.read.parquet(s"$modelDir/lm_unigram.parquet")
    val sb = scoreSbackoffWith(s, withLang, bgm, ugm, m.oovMicro,
      m.bgmRows, m.ugmRows)
    dsir.join(sb, Seq("doc_id"))
      .select(col("doc_id"), col("n_feat"), col("dsir_micro"),
        col("key_micro"), col("admitted"),
        col("n_trans"), col("n_bg_hit"), col("n_oov"), col("sb_micro"))
  }

  /** Per-JVM scratch + per-corpus memo for the registered stored-model
    * query (the [[Dedup.minhashIndexBuildQuery]] pattern — fresh per JVM
    * so a stale model never serves regenerated testdata). */
  private lazy val modelScratch: java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft-selmodel-")
  private val builtModels =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Registered deployment-shape query: train the model on the bottom
    * 4/5 of the doc_id range (the [[Dedup.incrementSplitAt]] boundary —
    * the shared "old corpus vs new batch" convention), persist it, and
    * score the TOP 1/5 as the arriving batch — so the scored docs are
    * genuinely unseen (real backoff/OOV traffic, threshold admission of
    * new data), unlike the self-model queries above. Model built on
    * first use, memoized per corpus dir. */
  def storedModelScoreQuery(s: SparkSession, dir: String): DataFrame = {
    val split = Dedup.incrementSplitAt(s, dir)
    val modelDir = builtModels.computeIfAbsent(dir, _ => {
      // collision-free per-corpus key (round-14 advice): url-safe base64
      // of the FULL path is INJECTIVE (lossy character-replacement
      // sanitization is not: '/a/b' and '/a_b' would share a key and
      // silently cross-score); encodings longer than one filename
      // component are split into nested 100-char directory segments —
      // still injective (a prefix+hash fallback would not be)
      val enc = java.util.Base64.getUrlEncoder.withoutPadding
        .encodeToString(dir.getBytes("UTF-8"))
      val md = enc.grouped(100).foldLeft(modelScratch)(_.resolve(_)).toString
      buildSelectionModel(s, docs(s, dir).where(col("doc_id") < split), md)
      md
    })
    scoreWithStoredModel(s,
      docs(s, dir).where(col("doc_id") >= split).select(col("doc_id"), col("text")),
      modelDir)
  }

  // -------------------------------------------------------------------
  // DuckDB oracle SQL
  // -------------------------------------------------------------------

  /** The `feat → bkt` polynomial-hash SQL over a column named `f` (the
    * [[QualityModel]] vocab-grain rendering, BaseB). */
  private def bucketSql: String =
    s"""list_reduce(list_prepend(0::BIGINT,
       |      [ascii(x)::BIGINT for x in regexp_split_to_array(f, '')]),
       |      (a, c) -> (a * ${PolyHash.BaseB} + c) % ${PolyHash.Mod}) % $DsirDim""".stripMargin

  /** Shared DSIR CTE chain, parameterized by the model-corpus and
    * scoring-corpus predicates (`TRUE` for the self-model queries): all
    * features hashed at vocab grain once, bucket counts over the MODEL
    * slice, micro log-ratios over ALL [[DsirDim]] buckets (unseen buckets
    * get the pure smoothing ratio — `ln(1) = 0` exactly, matching
    * [[lrMicro]]), per-doc scores over the SCORING slice. */
  private def dsirCtes(modelWhere: String, scoreWhere: String): String =
    s"""WITH tk AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
       |feat AS (
       |  SELECT doc_id, lang, unnest(t) AS f FROM tk
       |  UNION ALL
       |  SELECT doc_id, lang,
       |    unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS f
       |  FROM tk),
       |fb AS (
       |  SELECT f, $bucketSql AS bkt
       |  FROM (SELECT DISTINCT f FROM feat)),
       |occ AS (SELECT doc_id, lang, bkt FROM feat JOIN fb USING (f)),
       |cnt AS (
       |  SELECT bkt, CAST(count(*) AS BIGINT) AS cr,
       |    CAST(sum(CASE WHEN lang = '$TargetLang' THEN 1 ELSE 0 END) AS BIGINT) AS ct
       |  FROM occ WHERE $modelWhere GROUP BY 1),
       |tot AS (
       |  SELECT CAST(coalesce(sum(cr), 0) AS BIGINT) AS r_tot,
       |         CAST(coalesce(sum(ct), 0) AS BIGINT) AS t_tot
       |  FROM cnt),
       |lr AS (
       |  SELECT i AS bkt,
       |    CAST(floor((ln(coalesce(ct, 0) + 1) - ln(t_tot + $DsirDim)
       |      - ln(coalesce(cr, 0) + 1) + ln(r_tot + $DsirDim)) * 1000000 + 0.5) AS BIGINT) AS lrm
       |  FROM range($DsirDim) r(i) LEFT JOIN cnt ON cnt.bkt = r.i, tot),
       |score AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feat,
       |    CAST(sum(lrm) AS BIGINT) AS dsir_micro
       |  FROM occ JOIN lr USING (bkt) WHERE $scoreWhere GROUP BY 1)""".stripMargin

  /** The Gumbel key as SQL over columns `dsir_micro`, `doc_id`. */
  private def gumbelKeySql: String = {
    import graft.operators.Sampling.{IdMod, Mix}
    s"""dsir_micro + CAST(floor(-ln(-ln(
       |      CAST(((doc_id % $IdMod) * $Mix) % $IdMod + 1 AS DOUBLE)
       |      / CAST(${IdMod + 1L} AS DOUBLE)))
       |    * 1000000 + 0.5) AS BIGINT)""".stripMargin
  }

  val dsirScoresSql: String =
    s"""${dsirCtes("TRUE", "TRUE")}
       |SELECT doc_id, n_feat, dsir_micro FROM score""".stripMargin

  /** The DSIR top-k pool as a WITH-prelude (the [[Curation.augSqlPrelude]]
    * shape): defines `sel` (the resampled doc_ids) and `selpool` (the
    * documents restricted to them) for a downstream query's `table`
    * parameter. The chain's CTE names (tk/feat/fb/occ/cnt/tot/lr/score)
    * are part of this builder's contract — embedders must not redefine
    * them. */
  def dsirTopKPoolPrelude(k: Int = DsirK): String =
    s"""${dsirCtes("TRUE", "TRUE").stripPrefix("WITH ")},
       |sel AS (
       |  SELECT doc_id FROM score
       |  ORDER BY $gumbelKeySql DESC, doc_id
       |  LIMIT $k),
       |selpool AS (
       |  SELECT d.* FROM documents d JOIN sel USING (doc_id)),
       |""".stripMargin

  def dsirGumbelTopKSql(k: Int = DsirK): String =
    s"""${dsirCtes("TRUE", "TRUE")}
       |SELECT doc_id, n_feat, dsir_micro, $gumbelKeySql AS key_micro
       |FROM score
       |ORDER BY key_micro DESC, doc_id
       |LIMIT $k""".stripMargin

  /** Shared backoff-LM CTE chain, parameterized like [[dsirCtes]]. Every
    * CTE name carries an `lm_` prefix so the chain composes with
    * [[dsirCtes]] in one WITH block (duplicate CTE names — `tk`, `tot` —
    * would otherwise collide in [[storedModelScoreSql]]). */
  private def sbackoffCtes(modelWhere: String, scoreWhere: String,
                           minCount: Long = 1L): String =
    s"""WITH lm_tk AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
       |lm_tok AS (SELECT doc_id, lang, unnest(t) AS tok FROM lm_tk),
       |lm_bg AS (
       |  SELECT doc_id, lang,
       |    unnest(t[1:len(t) - 1]) AS w1, unnest(t[2:len(t)]) AS w2
       |  FROM lm_tk),
       |lm_uni AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS c1
       |  FROM lm_tok WHERE lang = '$TargetLang' AND $modelWhere GROUP BY 1),
       |lm_tot AS (SELECT CAST(coalesce(sum(c1), 0) AS BIGINT) AS n_tot FROM lm_uni),
       |lm_bgm AS (
       |  SELECT b.w1, b.w2,
       |    CAST(floor((ln(c2) - ln(c1)) * 1000000 + 0.5) AS BIGINT) AS bg_micro
       |  FROM (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
       |        FROM lm_bg WHERE lang = '$TargetLang' AND $modelWhere GROUP BY 1, 2
       |        HAVING count(*) >= $minCount) b
       |  JOIN lm_uni u ON u.tok = b.w1),
       |lm_ugm AS (
       |  SELECT tok AS w2,
       |    CAST(floor((ln($Alpha) + ln(c1) - ln(n_tot)) * 1000000 + 0.5) AS BIGINT) AS ug_micro
       |  FROM lm_uni, lm_tot),
       |lm_sc AS (
       |  SELECT doc_id,
       |    coalesce(bg_micro, ug_micro,
       |      CAST(floor((ln($Alpha) + ln($Alpha) - ln(n_tot)) * 1000000 + 0.5) AS BIGINT)) AS sc,
       |    CASE WHEN bg_micro IS NOT NULL THEN 1 ELSE 0 END AS hit_bg,
       |    CASE WHEN bg_micro IS NULL AND ug_micro IS NULL THEN 1 ELSE 0 END AS is_oov
       |  FROM lm_bg LEFT JOIN lm_bgm USING (w1, w2) LEFT JOIN lm_ugm USING (w2), lm_tot
       |  WHERE $scoreWhere),
       |lm_agg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trans,
       |    CAST(sum(hit_bg) AS BIGINT) AS n_bg_hit,
       |    CAST(sum(is_oov) AS BIGINT) AS n_oov,
       |    CAST(sum(sc) AS BIGINT) AS sb_micro
       |  FROM lm_sc GROUP BY 1)""".stripMargin

  private def sbackoffTailSql(docsWhere: String): String =
    s"""SELECT d.doc_id,
       |  CAST(coalesce(n_trans, 0) AS BIGINT) AS n_trans,
       |  CAST(coalesce(n_bg_hit, 0) AS BIGINT) AS n_bg_hit,
       |  CAST(coalesce(n_oov, 0) AS BIGINT) AS n_oov,
       |  CAST(coalesce(sb_micro, 0) AS BIGINT) AS sb_micro
       |FROM documents d LEFT JOIN lm_agg USING (doc_id)
       |WHERE $docsWhere""".stripMargin

  val sbackoffScoresSql: String =
    s"""${sbackoffCtes("TRUE", "TRUE")}
       |${sbackoffTailSql("TRUE")}""".stripMargin

  /** Oracle twin of the PRUNED scorer (`q_sel_lm_sbackoff_pruned`): the
    * same chain with Brants' cutoff applied in the bigram CTE — one hash
    * gate over the whole pruned-model path, pinning that pruning only
    * moves scores through the unigram backoff tier. */
  def sbackoffPrunedSql(minCount: Long = 2L): String =
    s"""${sbackoffCtes("TRUE", "TRUE", minCount)}
       |${sbackoffTailSql("TRUE")}""".stripMargin

  /** The split boundary as portable SQL — [[Dedup.incrementSplitSql]]'s
    * ONE rendering, shared (a private re-derivation here could silently
    * desynchronize from the boundary [[Dedup.incrementSplitAt]] computes). */
  private def splitSql: String = Dedup.incrementSplitSql

  /** Oracle for [[storedModelScoreQuery]]: the DSIR chain with model =
    * bottom split / scoring = top split, the Gumbel key + threshold
    * admission (threshold = the offline top-k's boundary row over the
    * MODEL corpus scored under its own weights, with the doc_id
    * tie-break at the threshold key), joined to the backoff chain
    * under the same split. The scoring occurrences' buckets hit the
    * full-range `lr` CTE, so unseen features get the smoothing ratio —
    * matching the persisted all-bucket weight array. */
  def storedModelScoreSql(k: Int = DsirK): String =
    // the backoff chain carries the deployment default's Brants cutoff —
    // the stored model this query scores through is built pruned
    s"""${dsirCtes(s"doc_id < $splitSql", s"doc_id >= $splitSql")},
       |bscore AS (
       |  SELECT doc_id, CAST(sum(lrm) AS BIGINT) AS dsir_micro
       |  FROM occ JOIN lr USING (bkt) WHERE doc_id < $splitSql GROUP BY 1),
       |thr AS (
       |  SELECT key_micro AS thr, doc_id AS thr_doc_id FROM (
       |    SELECT $gumbelKeySql AS key_micro, doc_id
       |    FROM bscore ORDER BY key_micro DESC, doc_id LIMIT $k)
       |  ORDER BY key_micro ASC, doc_id DESC LIMIT 1),
       |${sbackoffCtes(s"doc_id < $splitSql", s"doc_id >= $splitSql",
            StoredModelMinCount).replaceFirst("^WITH ", "")}
       |SELECT s.doc_id, s.n_feat, s.dsir_micro,
       |  $gumbelKeySql AS key_micro,
       |  (($gumbelKeySql) > (SELECT thr FROM thr)
       |    OR (($gumbelKeySql) = (SELECT thr FROM thr)
       |        AND s.doc_id <= (SELECT thr_doc_id FROM thr))) AS admitted,
       |  CAST(coalesce(a.n_trans, 0) AS BIGINT) AS n_trans,
       |  CAST(coalesce(a.n_bg_hit, 0) AS BIGINT) AS n_bg_hit,
       |  CAST(coalesce(a.n_oov, 0) AS BIGINT) AS n_oov,
       |  CAST(coalesce(a.sb_micro, 0) AS BIGINT) AS sb_micro
       |FROM score s LEFT JOIN lm_agg a USING (doc_id)""".stripMargin

  // -------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sel_dsir" -> (dsirScores _),
    "q_sel_dsir_gumbel" -> ((s: SparkSession, d: String) => dsirGumbelTopK(s, d)),
    "q_sel_lm_sbackoff" -> ((s: SparkSession, d: String) => sbackoffScores(s, d)),
    "q_sel_lm_sbackoff_pruned" ->
      ((s: SparkSession, d: String) => sbackoffScores(s, d, minCount = 2L)),
    "q_sel_model_score" -> (storedModelScoreQuery _))

  val oracles: Map[String, String] = Map(
    "q_sel_dsir" -> dsirScoresSql,
    "q_sel_dsir_gumbel" -> dsirGumbelTopKSql(),
    "q_sel_lm_sbackoff" -> sbackoffScoresSql,
    "q_sel_lm_sbackoff_pruned" -> sbackoffPrunedSql(),
    "q_sel_model_score" -> storedModelScoreSql())

  /** Brants cutoff the DEPLOYMENT paths default to (round-15 verdict
    * task 6): `buildSelectionModel` — and so the registered stored-model
    * query, [[graft.streaming.StreamSelect]], and every at-ingest scorer
    * over a default-built model — prunes singleton bigrams. §8.5.14
    * priced it: the raw table is corpus-shaped (3.2M rows at the 100k-doc
    * probe corpus — over the 2M broadcast convention, so the per-batch LM
    * join went keyed-shuffle-shaped), the pruned one is vocabulary-shaped
    * (1.7M — back under it, and the scorer's maybeBroadcast flips to a
    * broadcast join). The cutoff rides the model meta handshake
    * (`min_count`), so a scorer can always tell what model it serves;
    * self-model DEMONSTRATION queries (`q_sel_lm_sbackoff`) keep the
    * unpruned default 1 with the pruned twin alongside.
    *
    * (Declared near the object head: `storedModelScoreSql` interpolates
    * it while the `oracles` val initializes — a later declaration would
    * read the uninitialized 0.) */
}
