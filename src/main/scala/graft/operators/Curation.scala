package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The end-to-end corpus-curation pass — the composition a training-data
  * pipeline actually runs, as ONE declarative plan:
  *
  *   1. exact-dup collapse ([[Dedup.exactDedup]] semantics: keep each
  *      text's minimum doc_id);
  *   2. rule-based quality gating (the [[TextAnalysis.gopherGates]]
  *      battery — here the four gates that are meaningful on a synthetic
  *      corpus: word-count bounds, mean-word-length bounds, symbol ratio,
  *      alpha-word fraction; the stop-word gate is a configuration choice
  *      and would reject ALL synthetic-vocabulary text, documented in the
  *      gates query's spec);
  *   3. per-source token-budget sampling ([[Sampling.tokenBudgetSample]]
  *      rule: deterministic hash order, prefix-until-budget).
  *
  * Everything stays inside one Catalyst plan: the collapse is a keyed
  * semi-join, the gates AND the per-doc token count come out of a single
  * map-only projection ([[TextAnalysis.gopherGatesOn]]'s `carry`
  * threading — one `split`, one scan of the text), the budget is a
  * partitioned running-sum window — scan-once, no driver round-trips, no
  * RNG. Gate thresholds and the hash ordering are NOT re-derived here:
  * the Scala side inherits them from [[TextAnalysis.gopherGatesOn]] and
  * [[Sampling.hashOrder]], and the oracle assembles from
  * [[TextAnalysis.gopherGateSqlByName]] / [[TextAnalysis.gopherStatsSqlCols]]
  * / [[Sampling.hashOrderSql]], so a threshold or hash change updates
  * query and oracle together instead of desynchronizing them. At 100 TB
  * each stage is exactly the shape its standalone operator measured in
  * ScaleProbe (§8.5), and composing them REDUCES downstream cost (the
  * window runs on the gated survivor stream, not the corpus).
  */
object Curation {

  private def docs(s: SparkSession, dir: String) = Tables(s, dir, "documents")

  /** The gates that are live on the synthetic corpus ([[curationGates]]
    * on the English-bearing fixture adds the remaining three). */
  val SyntheticGates: Seq[String] =
    Seq("gate_word_count", "gate_word_len", "gate_symbol", "gate_alpha")

  def curatedTokenSample(s: SparkSession, dir: String,
                         budgetPerSource: Long = 600L,
                         gates: Seq[String] = SyntheticGates): DataFrame =
    curatedOn(s, docs(s, dir), budgetPerSource, gates)

  /** Unique observation names: a metric name may appear once per plan,
    * and Bench/Verify build this query repeatedly in one session. */
  private val curationSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def curatedOn(s: SparkSession, d: DataFrame,
                        budgetPerSource: Long, gates: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // stage 1: exact-dup collapse (keep the minimum doc_id per text)
    val keep = d.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    // stage 2: quality gates on the collapsed corpus — n_tok is computed
    // in the SAME projection as the gate stats (carry threading), so the
    // text is split exactly once. Per-gate attrition counters ride the
    // same scan via observe (the production question "which gate costs
    // the corpus" should never need a second pass); read them after any
    // action with [[graft.Observed.metrics]] under `graft_curation_<n>`.
    val stats = TextAnalysis.gopherGatesOn(s,
        d.join(keep, "doc_id")
          .withColumn("n_tok", size(split(col("text"), " ")).cast("long")),
        carry = Seq("source", "n_tok"))
      .observe(s"graft_curation_${curationSeq.incrementAndGet()}",
        count(lit(1)).as("docs_in"),
        sum(gates.map(col).reduce(_ && _).cast("long")).as("docs_pass") +:
          gates.map(g => sum(col(g).cast("long")).as(s"pass_$g")): _*)
    val gated = stats
      .filter(gates.map(col).reduce(_ && _))
      .select(col("doc_id"), col("source"), col("n_tok"))
    // stage 3: per-source token budget over the survivors, deterministic
    // hash order (the SAME rule + hash object as Sampling.tokenBudgetSample)
    val w = Window.partitionBy(col("source"))
      .orderBy(Sampling.hashOrder, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    gated
      .withColumn("tok_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .filter(col("tok_before") < budgetPerSource)
      .select(col("doc_id"), col("source"), col("n_tok"), col("tok_before"))
  }

  def curatedTokenSampleSql(budgetPerSource: Long = 600L,
                            gates: Seq[String] = SyntheticGates,
                            table: String = "documents",
                            prelude: String = ""): String = {
    val gateSql = gates.map(TextAnalysis.gopherGateSqlByName)
      .mkString("\n    AND ")
    s"""WITH ${prelude}keep AS (
      |  SELECT min(doc_id) AS doc_id FROM $table GROUP BY md5(text)),
      |g AS (
      |  SELECT d.doc_id, d.source,
      |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
      |    ${TextAnalysis.gopherStatsSqlCols("d.text")}
      |  FROM $table d JOIN keep USING (doc_id)),
      |surv AS (
      |  SELECT doc_id, source, n_tok FROM g
      |  WHERE $gateSql),
      |p AS (
      |  SELECT doc_id, source, n_tok,
      |    CAST(coalesce(sum(n_tok) OVER (
      |      PARTITION BY source
      |      ORDER BY ${Sampling.hashOrderSql}, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_before
      |  FROM surv)
      |SELECT doc_id, source, n_tok, tok_before FROM p
      |WHERE tok_before < $budgetPerSource""".stripMargin
  }

  // -----------------------------------------------------------------
  // Full 7-gate curation on a deterministically English-augmented corpus
  // -----------------------------------------------------------------

  /** The synthetic vocabulary contains no English function words, so the
    * stop-word gate would reject EVERYTHING and the bullet/ellipsis gates
    * are vacuous on 1-line docs. Rather than a side fixture the driver's
    * oracle can't see, the full-battery pipeline runs on a DETERMINISTIC
    * doc_id-keyed augmentation of `documents` (the `q_text_pii_scrub`
    * trick): the same expression computes in Spark and DuckDB, so the
    * 7-gate pipeline is oracle-verified end-to-end on a corpus where
    * every gate is LIVE — the stop gate passes exactly the docs given a
    * stopword tail, the bullet gate fails the all-bullet docs, the
    * ellipsis gate fails the ellipsis-heavy docs (`CurationSpec` asserts
    * each gate discriminates). */
  val BulletLines: Seq[String] = (1 to 10).map(i => s"- bullet $i")
  // no Gopher stopwords in these lines — the stop gate must key ONLY off
  // the deterministic stopword tail, or its pass set stops being provable
  val EllipsisLines: Seq[String] = Seq("read more...", "see details...", "loading results...")
  val StopwordTail: String = " the and of that have with"

  def augmentedDocs(s: SparkSession, dir: String): DataFrame = {
    val t1 = when(pmod(col("doc_id"), lit(5L)) === 0,
      concat(lit(BulletLines.mkString("", "\n", "\n")), col("text"))).otherwise(col("text"))
    val t2 = when(pmod(col("doc_id"), lit(7L)) === 0,
      concat(t1, lit(EllipsisLines.mkString("\n", "\n", "")))).otherwise(t1)
    val t3 = when(pmod(col("doc_id"), lit(2L)) === 0,
      concat(t2, lit(StopwordTail))).otherwise(t2)
    docs(s, dir).select(col("doc_id"), col("source"), t3.as("text"))
  }

  /** DuckDB twin of [[augmentedDocs]], as a WITH-prelude defining `aug`. */
  def augSqlPrelude: String = {
    val bullets = BulletLines.map(l => s"'$l' || chr(10)").mkString(" || ") + " || text"
    val ellipses = "t1" + EllipsisLines.map(l => s"chr(10) || '$l'").mkString(" || ", " || ", "")
    s"""aug AS (
      |  SELECT doc_id, source,
      |    CASE WHEN doc_id % 2 = 0 THEN t2 || '$StopwordTail' ELSE t2 END AS text
      |  FROM (
      |    SELECT doc_id, source,
      |      CASE WHEN doc_id % 7 = 0 THEN $ellipses ELSE t1 END AS t2
      |    FROM (
      |      SELECT doc_id, source,
      |        CASE WHEN doc_id % 5 = 0 THEN $bullets ELSE text END AS t1
      |      FROM documents))),
      |""".stripMargin
  }

  def curatedTokenSampleFull(s: SparkSession, dir: String,
                             budgetPerSource: Long = 600L): DataFrame =
    curatedOn(s, augmentedDocs(s, dir), budgetPerSource, TextAnalysis.GopherGateNames)

  def curatedTokenSampleFullSql(budgetPerSource: Long = 600L): String =
    curatedTokenSampleSql(budgetPerSource, TextAnalysis.GopherGateNames,
      table = "aug", prelude = augSqlPrelude)

  // -----------------------------------------------------------------
  // Per-document attrition attribution (round 14)
  // -----------------------------------------------------------------

  /** The lineage/audit layer a production pipeline keeps next to its
    * keep-set: for EVERY input document, the FIRST stage that dropped it
    * — `exact_dup` (not its text group's min doc_id), the first failing
    * gate (in battery order), `budget` (gated survivor past its source's
    * token budget), or `kept`. One row per input doc, totality by
    * construction. The `observe` counters on [[curatedTokenSample]]
    * answer "which gate costs the corpus" in aggregate; this answers the
    * per-document "why is doc X missing from the training set" —
    * deterministic, so the answer is stable across re-runs and engines.
    *
    * Single-sourced like the pipeline itself: gate expressions come from
    * [[TextAnalysis.gopherGatesOn]] (Scala) /
    * [[TextAnalysis.gopherGateSqlByName]] (oracle); the budget window is
    * the [[Sampling.hashOrder]] prefix rule; the stage ORDER mirrors the
    * pipeline's stage order, so `attrition` is provably consistent with
    * [[curatedTokenSample]]: `kept` rows = its output set (CurationSpec
    * pins the identity). Plan: the same collapse/gate/window stages plus
    * one left join back to the corpus at doc grain — scan costs identical
    * to the pipeline it explains. */
  def attrition(s: SparkSession, dir: String,
                budgetPerSource: Long = 600L,
                gates: Seq[String] = SyntheticGates): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
    val keep = d.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
      .withColumn("in_keep", lit(true))
    val stats = TextAnalysis.gopherGatesOn(s,
      d.join(keep, Seq("doc_id"), "left")
        .withColumn("n_tok", size(split(col("text"), " ")).cast("long")),
      carry = Seq("source", "n_tok", "in_keep"))
    val passAll = gates.map(col).reduce(_ && _)
    val w = Window.partitionBy(col("source"))
      .orderBy(Sampling.hashOrder, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // the budget window runs over the SAME survivor stream the pipeline
    // budgets (collapse-kept AND gated) — earlier-dropped docs must not
    // consume budget, or the attribution would disagree with the pipeline
    val withBudget = stats
      .withColumn("tok_before",
        when(col("in_keep").isNotNull && passAll,
          coalesce(sum(when(col("in_keep").isNotNull && passAll, col("n_tok")))
            .over(w), lit(0L))))
    val firstFailingGate = gates.reverse.foldLeft(lit(null).cast("string")) {
      (rest, g) => when(!col(g), lit(g)).otherwise(rest)
    }
    withBudget.select(col("doc_id"), col("source"), col("n_tok"),
      when(col("in_keep").isNull, lit("exact_dup"))
        .otherwise(coalesce(firstFailingGate,
          when(col("tok_before") >= budgetPerSource, lit("budget"))
            .otherwise(lit("kept")))).as("stage"))
  }

  def attritionSql(budgetPerSource: Long = 600L,
                   gates: Seq[String] = SyntheticGates): String = {
    val gateFailCase = gates.map(g =>
      s"WHEN NOT (${TextAnalysis.gopherGateSqlByName(g)}) THEN '$g'").mkString("\n      ")
    val passAll = gates.map(TextAnalysis.gopherGateSqlByName).mkString("\n    AND ")
    s"""WITH keep AS (
       |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |g AS (
       |  SELECT d.doc_id, d.source,
       |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
       |    (k.doc_id IS NOT NULL) AS in_keep,
       |    ${TextAnalysis.gopherStatsSqlCols("d.text")}
       |  FROM documents d LEFT JOIN keep k USING (doc_id)),
       |b AS (
       |  SELECT *,
       |    CASE WHEN in_keep AND ($passAll) THEN
       |      CAST(coalesce(sum(CASE WHEN in_keep AND ($passAll) THEN n_tok END) OVER (
       |        PARTITION BY source
       |        ORDER BY ${Sampling.hashOrderSql}, doc_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    END AS tok_before
       |  FROM g)
       |SELECT doc_id, source, n_tok,
       |  CASE WHEN NOT in_keep THEN 'exact_dup'
       |      $gateFailCase
       |      WHEN tok_before >= $budgetPerSource THEN 'budget'
       |      ELSE 'kept' END AS stage
       |FROM b""".stripMargin
  }

  // -----------------------------------------------------------------
  // Curation WITH the model-based selection rung (round 14)
  // -----------------------------------------------------------------

  /** The curation pass over the DSIR-SELECTED pool — the composition a
    * modern pipeline actually deploys (dedup + quality gates +
    * distribution matching + budget, e.g. the DoReMi/DSIR-style recipe):
    * the raw corpus is first resampled to the k documents closest to the
    * target distribution ([[Selection.dsirGumbelTopK]] — the paper
    * selects from the RAW pool, before any cleaning), and the standard
    * three-stage curation then runs on that pool. Plan shape: the
    * resample is `TakeOrderedAndProject` (k rows to the driver), the
    * pool restriction a broadcast semi-join, and every downstream stage
    * runs on the k-doc survivor stream — composing REDUCES cost, exactly
    * like the gates-before-window argument above. */
  def curatedSelectedSample(s: SparkSession, dir: String,
                            budgetPerSource: Long = 600L,
                            gates: Seq[String] = SyntheticGates,
                            k: Int = Selection.DsirK): DataFrame = {
    val admitted = Selection.dsirGumbelTopK(s, dir, k).select("doc_id")
    curatedOn(s, docs(s, dir).join(broadcast(admitted), Seq("doc_id")),
      budgetPerSource, gates)
  }

  /** Oracle: the DSIR top-k CTE chain as a prelude restricting the
    * curation SQL's input table (CTE names are disjoint by construction —
    * dsir's tk/feat/fb/occ/cnt/tot/lr/score vs curation's keep/g/surv/p). */
  def curatedSelectedSampleSql(budgetPerSource: Long = 600L,
                               gates: Seq[String] = SyntheticGates,
                               k: Int = Selection.DsirK): String = {
    val prelude = Selection.dsirTopKPoolPrelude(k)
    curatedTokenSampleSql(budgetPerSource, gates,
      table = "selpool", prelude = prelude)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_curation" -> ((s: SparkSession, d: String) => curatedTokenSample(s, d)),
    "q_pipeline_curation_full" -> ((s: SparkSession, d: String) => curatedTokenSampleFull(s, d)),
    "q_pipeline_curation_select" -> ((s: SparkSession, d: String) => curatedSelectedSample(s, d)),
    "q_pipeline_attrition" -> ((s: SparkSession, d: String) => attrition(s, d)))

  val oracles: Map[String, String] = Map(
    "q_pipeline_curation" -> curatedTokenSampleSql(),
    "q_pipeline_curation_full" -> curatedTokenSampleFullSql(),
    "q_pipeline_curation_select" -> curatedSelectedSampleSql(),
    "q_pipeline_attrition" -> attritionSql())
}
