package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * (bucket / bigram / unigram — never per occurrence) and immediately
  * quantized to integer micro-units with `floor(x·10⁶ + 0.5)` (the
  * [[TextAnalysis.tfidfTopTerms]] parity rule — `round()` disagrees
  * between Spark's HALF_UP and DuckDB's half-even at representable
  * midpoints; a floored transcendental never lands on one). Per-document
  * scores are then BIGINT sums of those micro-units — integer addition
  * commutes, so the decision statistic is exact under any aggregation
  * order, and the hash gate compares integers end to end.
  *
  * Scale shape (100 TB):
  *  - DSIR's model is TWO aggregations down to [[DsirDim]] bucket rows
  *    (collected driver-side — the learnCentroids discipline; a
  *    deployment estimates them on a hash sample, `Sampling.hashPct`),
  *    and scoring is map-shaped: tokenize, hash, `element_at` into a
  *    literal micro-weight array, one partial+final agg per doc. The only
  *    corpus-sized shuffle is the per-doc aggregation itself.
  *  - The Gumbel resample is `TakeOrderedAndProject` (per-partition
  *    top-k, k rows to the driver) — never a global sort.
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
  private val TargetLang = "en"

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
    * tax this path avoids). No shuffle; feeds both aggregations below. */
  private def featureBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir).select(col("doc_id"), col("lang"), col("text"))
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
    * (≤1 ulp apart) `ln`. Computed driver-side from the [[DsirDim]]-row
    * collected count table. */
  private def lrMicro(ct: Long, cr: Long, tTot: Long, rTot: Long): Long =
    math.floor((math.log(ct + 1L) - math.log(tTot + DsirDim)
      - math.log(cr + 1L) + math.log(rTot + DsirDim)) * 1e6 + 0.5).toLong

  /** Per-document DSIR log importance weight: `(doc_id, n_feat,
    * dsir_micro)`. Two passes over the corpus (model, then score) — the
    * model pass is sample-sized at deployment; the score pass is one
    * map-shaped sweep ending in the per-doc aggregation. */
  def dsirScores(s: SparkSession, dir: String): DataFrame = {
    val fb = featureBuckets(s, dir)
    val counts = fb.groupBy(col("bkt"))
      .agg(count(lit(1)).as("cr"), sum(col("is_target")).as("ct"))
      .collect()
    val cr = new Array[Long](DsirDim)
    val ct = new Array[Long](DsirDim)
    counts.foreach { r =>
      val b = r.getLong(0).toInt
      cr(b) = r.getLong(1); ct(b) = r.getLong(2)
    }
    val rTot = cr.sum; val tTot = ct.sum
    val lr = Array.tabulate(DsirDim)(b => lrMicro(ct(b), cr(b), tTot, rTot))
    fb.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feat"),
           sum(element_at(typedlit(lr.toSeq), (col("bkt") + 1).cast("int")))
             .as("dsir_micro"))
  }

  /** How many documents the resample keeps (the paper's k; 20 % of the
    * sf0.01 gate corpus). A fixed k — not a fraction — is the published
    * semantics: "select k examples from the raw pool". */
  val DsirK = 100

  /** Gumbel-top-k importance resample, derandomized: the sampling key is
    * `log w(x) + Gumbel(0,1)` with the Gumbel drawn from the repo's
    * splitmix hash of `doc_id` (`u = (h+1)/(IdMod+1)` — an exact rational
    * both engines turn into the identical double), quantized to the same
    * micro-units and ADDED to the integer score, so selection order is a
    * pure BIGINT comparison. Plan: `TakeOrderedAndProject` — k rows cross
    * the wire, never a sort of the corpus. */
  def dsirGumbelTopK(s: SparkSession, dir: String, k: Int = DsirK): DataFrame = {
    import graft.operators.Sampling.{IdMod, Mix}
    val h = pmod(pmod(col("doc_id"), lit(IdMod)) * lit(Mix), lit(IdMod))
    val u = (h + lit(1L)).cast("double") / lit((IdMod + 1L).toDouble)
    dsirScores(s, dir)
      .withColumn("key_micro",
        col("dsir_micro") +
          floor(-log(-log(u)) * lit(1e6) + lit(0.5)).cast("long"))
      .orderBy(col("key_micro").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("n_feat"), col("dsir_micro"), col("key_micro"))
  }

  /** The `feat → bkt` polynomial-hash SQL over a column named `f` (the
    * [[QualityModel]] vocab-grain rendering, BaseB). */
  private def bucketSql: String =
    s"""list_reduce(list_prepend(0::BIGINT,
       |      [ascii(x)::BIGINT for x in regexp_split_to_array(f, '')]),
       |      (a, c) -> (a * ${PolyHash.BaseB} + c) % ${PolyHash.Mod}) % $DsirDim""".stripMargin

  /** Shared oracle CTE chain: occurrence-grain features, vocab-grain
    * bucket hash, bucket counts, micro log-ratios, per-doc scores. */
  private def dsirScoreCtes: String =
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
       |  FROM occ GROUP BY 1),
       |tot AS (
       |  SELECT CAST(sum(cr) AS BIGINT) AS r_tot, CAST(sum(ct) AS BIGINT) AS t_tot
       |  FROM cnt),
       |lr AS (
       |  SELECT bkt,
       |    CAST(floor((ln(ct + 1) - ln(t_tot + $DsirDim)
       |      - ln(cr + 1) + ln(r_tot + $DsirDim)) * 1000000 + 0.5) AS BIGINT) AS lrm
       |  FROM cnt, tot),
       |score AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feat,
       |    CAST(sum(lrm) AS BIGINT) AS dsir_micro
       |  FROM occ JOIN lr USING (bkt) GROUP BY 1)""".stripMargin

  val dsirScoresSql: String =
    s"""$dsirScoreCtes
       |SELECT doc_id, n_feat, dsir_micro FROM score""".stripMargin

  def dsirGumbelTopKSql(k: Int = DsirK): String = {
    import graft.operators.Sampling.{IdMod, Mix}
    s"""$dsirScoreCtes
       |SELECT doc_id, n_feat, dsir_micro,
       |  dsir_micro + CAST(floor(-ln(-ln(
       |      CAST(((doc_id % $IdMod) * $Mix) % $IdMod + 1 AS DOUBLE)
       |      / CAST(${IdMod + 1L} AS DOUBLE)))
       |    * 1000000 + 0.5) AS BIGINT) AS key_micro
       |FROM score
       |ORDER BY key_micro DESC, doc_id
       |LIMIT $k""".stripMargin
  }

  // -------------------------------------------------------------------
  // Stupid-backoff bigram LM scoring (the CCNet filter's scoring rung)
  // -------------------------------------------------------------------

  /** Brants' backoff discount. */
  private val Alpha = 0.4

  /** `(doc_id, lang, w1, w2)` at transition grain — map-side typed
    * flatMap, same idiom as the DSIR featurizer. */
  private def transitions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir).select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .flatMap { case (id, lang, text) =>
        val w = text.split(" ", -1)
        (0 until w.length - 1).iterator.map(i => (id, lang, w(i), w(i + 1)))
      }.toDF("doc_id", "lang", "w1", "w2")
  }

  /** Score every document's token transitions under a stupid-backoff
    * bigram LM trained on the [[TargetLang]] reference slice:
    *
    *   S(w2|w1) = c(w1 w2)/c(w1)      if the bigram was seen
    *            = α·c(w2)/N           else if w2 is in-vocabulary
    *            = α²/N                else (OOV floor)
    *
    * each tier quantized at MODEL grain (`floor(ln(...)·10⁶ + 0.5)`),
    * per-doc summed in BIGINT. Output: `(doc_id, n_trans, n_bg_hit,
    * n_oov, sb_micro)` — low `sb_micro/n_trans` is the CCNet "tail"
    * (discard or down-weight); `n_oov` exposes the vocabulary miss rate
    * that makes non-reference-language docs score low.
    *
    * Plan: model tables at bigram/vocab grain joined under the 2 M
    * broadcast convention; scoring is one transition-grain sweep ending
    * in the per-doc aggregation; docs with < 2 tokens survive via the
    * trailing left join (zero transitions, zero score). */
  def sbackoffScores(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val refToks = d.where(col("lang") === TargetLang)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val uni = refToks.groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val total = uni.agg(sum(col("c1")).as("n_tot"))
    val bgCounts = transitions(s, dir).where(col("lang") === TargetLang)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val bgm = bgCounts.join(uni.withColumnRenamed("tok", "w1"), Seq("w1"))
      .select(col("w1"), col("w2"),
        floor((log(col("c2")) - log(col("c1"))) * lit(1e6) + lit(0.5))
          .cast("long").as("bg_micro"))
    val ugm = uni.crossJoin(broadcast(total))
      .select(col("tok").as("w2"),
        floor((log(lit(Alpha)) + log(col("c1")) - log(col("n_tot"))) * lit(1e6)
          + lit(0.5)).cast("long").as("ug_micro"))
    val scored = transitions(s, dir)
      .crossJoin(broadcast(total))
      .join(IndexFamily.maybeBroadcast(bgm, bgm.count()), Seq("w1", "w2"), "left")
      .join(IndexFamily.maybeBroadcast(ugm, ugm.count()), Seq("w2"), "left")
      .select(col("doc_id"),
        coalesce(col("bg_micro"), col("ug_micro"),
          floor((log(lit(Alpha)) + log(lit(Alpha)) - log(col("n_tot"))) * lit(1e6)
            + lit(0.5)).cast("long")).as("sc"),
        col("bg_micro").isNotNull.cast("long").as("hit_bg"),
        (col("bg_micro").isNull && col("ug_micro").isNull).cast("long").as("is_oov"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trans"), sum(col("hit_bg")).as("n_bg_hit"),
           sum(col("is_oov")).as("n_oov"), sum(col("sc")).as("sb_micro"))
    d.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trans"), lit(0L)).as("n_trans"),
        coalesce(col("n_bg_hit"), lit(0L)).as("n_bg_hit"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("sb_micro"), lit(0L)).as("sb_micro"))
  }

  val sbackoffScoresSql: String =
    s"""WITH tk AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
       |tok AS (SELECT doc_id, lang, unnest(t) AS tok FROM tk),
       |bg AS (
       |  SELECT doc_id, lang,
       |    unnest(t[1:len(t) - 1]) AS w1, unnest(t[2:len(t)]) AS w2
       |  FROM tk),
       |uni AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS c1
       |  FROM tok WHERE lang = '$TargetLang' GROUP BY 1),
       |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n_tot FROM uni),
       |bgm AS (
       |  SELECT b.w1, b.w2,
       |    CAST(floor((ln(c2) - ln(c1)) * 1000000 + 0.5) AS BIGINT) AS bg_micro
       |  FROM (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
       |        FROM bg WHERE lang = '$TargetLang' GROUP BY 1, 2) b
       |  JOIN uni u ON u.tok = b.w1),
       |ugm AS (
       |  SELECT tok AS w2,
       |    CAST(floor((ln($Alpha) + ln(c1) - ln(n_tot)) * 1000000 + 0.5) AS BIGINT) AS ug_micro
       |  FROM uni, tot),
       |sc AS (
       |  SELECT doc_id,
       |    coalesce(bg_micro, ug_micro,
       |      CAST(floor((ln($Alpha) + ln($Alpha) - ln(n_tot)) * 1000000 + 0.5) AS BIGINT)) AS sc,
       |    CASE WHEN bg_micro IS NOT NULL THEN 1 ELSE 0 END AS hit_bg,
       |    CASE WHEN bg_micro IS NULL AND ug_micro IS NULL THEN 1 ELSE 0 END AS is_oov
       |  FROM bg LEFT JOIN bgm USING (w1, w2) LEFT JOIN ugm USING (w2), tot),
       |agg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trans,
       |    CAST(sum(hit_bg) AS BIGINT) AS n_bg_hit,
       |    CAST(sum(is_oov) AS BIGINT) AS n_oov,
       |    CAST(sum(sc) AS BIGINT) AS sb_micro
       |  FROM sc GROUP BY 1)
       |SELECT d.doc_id,
       |  CAST(coalesce(n_trans, 0) AS BIGINT) AS n_trans,
       |  CAST(coalesce(n_bg_hit, 0) AS BIGINT) AS n_bg_hit,
       |  CAST(coalesce(n_oov, 0) AS BIGINT) AS n_oov,
       |  CAST(coalesce(sb_micro, 0) AS BIGINT) AS sb_micro
       |FROM documents d LEFT JOIN agg USING (doc_id)""".stripMargin

  // -------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sel_dsir" -> (dsirScores _),
    "q_sel_dsir_gumbel" -> ((s: SparkSession, d: String) => dsirGumbelTopK(s, d)),
    "q_sel_lm_sbackoff" -> (sbackoffScores _))

  val oracles: Map[String, String] = Map(
    "q_sel_dsir" -> dsirScoresSql,
    "q_sel_dsir_gumbel" -> dsirGumbelTopKSql(),
    "q_sel_lm_sbackoff" -> sbackoffScoresSql)
}
