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
  * semi-join, the gates are a map-only projection, the budget is a
  * partitioned running-sum window — scan-once, no driver round-trips, no
  * RNG. At 100 TB each stage is exactly the shape its standalone operator
  * measured in ScaleProbe (§8.5), and composing them REDUCES downstream
  * cost (the window runs on the gated survivor stream, not the corpus).
  */
object Curation {

  private def docs(s: SparkSession, dir: String) = Tables(s, dir, "documents")

  def curatedTokenSample(s: SparkSession, dir: String,
                         budgetPerSource: Long = 600L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
    // stage 1: exact-dup collapse (keep the minimum doc_id per text)
    val keep = d.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    // stage 2: quality gates on the collapsed corpus
    val gated = TextAnalysis.gopherGatesOn(s, d.join(keep, "doc_id"))
      .filter(col("gate_word_count") && col("gate_word_len") &&
              col("gate_symbol") && col("gate_alpha"))
      .select("doc_id")
    // stage 3: per-source token budget over the survivors, deterministic
    // hash order (same rule + hash as Sampling.tokenBudgetSample)
    val hashOrder = pmod(pmod(col("doc_id"), lit(Sampling.IdMod)) * lit(Sampling.Mix),
                         lit(Sampling.IdMod))
    val w = Window.partitionBy(col("source")).orderBy(hashOrder, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    d.join(gated, "doc_id")
      .select(col("doc_id"), col("source"),
              size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("tok_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .filter(col("tok_before") < budgetPerSource)
      .select(col("doc_id"), col("source"), col("n_tok"), col("tok_before"))
  }

  def curatedTokenSampleSql(budgetPerSource: Long = 600L): String = {
    val ws = TextAnalysis.NonWsClass
    s"""WITH keep AS (
      |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
      |g AS (
      |  SELECT d.doc_id, d.source,
      |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
      |    CAST(len(regexp_extract_all(d.text, '$ws+')) AS BIGINT) AS n_words,
      |    CAST(coalesce(list_sum(list_transform(
      |      regexp_extract_all(d.text, '$ws+'), w -> length(w))), 0) AS BIGINT) AS word_chars,
      |    CAST(len(regexp_extract_all(d.text, '#'))
      |       + len(regexp_extract_all(d.text, '\\.\\.\\.')) AS BIGINT) AS n_symbols,
      |    CAST(len(list_filter(regexp_extract_all(d.text, '$ws+'),
      |      w -> regexp_matches(w, '\\p{L}'))) AS BIGINT) AS alpha_words
      |  FROM documents d JOIN keep USING (doc_id)),
      |surv AS (
      |  SELECT doc_id, source, n_tok FROM g
      |  WHERE n_words >= 50 AND n_words <= 100000
      |    AND 3 * n_words <= word_chars AND word_chars <= 10 * n_words
      |    AND 10 * n_symbols <= n_words
      |    AND 5 * alpha_words >= 4 * n_words),
      |p AS (
      |  SELECT doc_id, source, n_tok,
      |    CAST(coalesce(sum(n_tok) OVER (
      |      PARTITION BY source
      |      ORDER BY (doc_id % ${Sampling.IdMod}) * ${Sampling.Mix} % ${Sampling.IdMod}, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_before
      |  FROM surv)
      |SELECT doc_id, source, n_tok, tok_before FROM p
      |WHERE tok_before < $budgetPerSource""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_curation" -> ((s: SparkSession, d: String) => curatedTokenSample(s, d)))

  val oracles: Map[String, String] = Map(
    "q_pipeline_curation" -> curatedTokenSampleSql())
}
