package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline surface (token counting, quality scoring,
  * language ID, fingerprinting). All built from codegen'd Catalyst
  * built-ins (regexp/array higher-order functions); the only join
  * (language profiles) is a broadcast of a ~dozen-row literal table.
  *
  * 100 TB notes: every operator here is embarrassingly parallel — a
  * single projection pass per document with no shuffle (language ID
  * shuffles only (doc_id, lang) score rows, bounded by |docs|×|langs|).
  */
object TextAnalysis {

  private def docs(s: SparkSession, dir: String) = Tables(s, dir, "documents")

  private val tokens: Column = split(col("text"), " ")

  /** Explicit whitespace / non-whitespace classes for ORACLED regexes:
    * Java's `\s` includes vertical tab (\x0B), RE2's (DuckDB) does not, so
    * `\s`/`\S` in an oracle-matched pattern diverges on that one control
    * character. Spelled-out classes parse identically in both engines. */
  val WsClass = """[ \t\n\r\f\x0B]"""
  val NonWsClass = """[^ \t\n\r\f\x0B]"""

  /** Whitespace-token and character counts. */
  def tokenCounts(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(NonWsClass + "+"), lit(0))).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars_actual"))

  val tokenCountsSql: String =
    s"""SELECT doc_id,
      |  CAST(length(regexp_extract_all(text, '$NonWsClass+')) AS BIGINT) AS n_tokens,
      |  CAST(length(text) AS BIGINT) AS n_chars_actual
      |FROM documents""".stripMargin

  /** Heuristic quality score: token count, mean token length, stopword
    * ratio, combined into [0,1]. Mirrors the shape of production quality
    * filters (length/stopword gates); deterministic and oracle-matched. */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val nTok = size(tokens).cast("double")
    val stopTok = size(filter(tokens, t => t.isin("the", "a"))).cast("double")
    val sumLen = aggregate(tokens, lit(0L), (acc, t) => acc + length(t)).cast("double")
    docs(s, dir).select(
      col("doc_id"),
      nTok.cast("long").as("n_tokens"),
      round(sumLen / nTok, 4).as("avg_token_len"),
      round(stopTok / nTok, 4).as("stopword_ratio"),
      round(least(nTok / lit(100.0), lit(1.0)) * (lit(1.0) - stopTok / nTok), 4).as("quality"))
  }

  val qualityScoreSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  round(list_sum(list_transform(string_split(text, ' '), t -> len(t))) * 1.0
      |        / len(string_split(text, ' ')), 4) AS avg_token_len,
      |  round(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) * 1.0
      |        / len(string_split(text, ' ')), 4) AS stopword_ratio,
      |  round(least(len(string_split(text, ' ')) / 100.0, 1.0)
      |        * (1.0 - len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) * 1.0
      |               / len(string_split(text, ' '))), 4) AS quality
      |FROM documents""".stripMargin

  /** Stopword-profile language ID (n-gram-heuristic family): score each
    * candidate language by the fraction of document tokens found in its
    * profile; argmax with deterministic tie-break. The profile table is a
    * literal broadcast dim; the aggregation shuffles only (doc_id, lang)
    * partial counts. Rows-only checked (heuristic — no SQL oracle). */
  def languageId(s: SparkSession, dir: String): DataFrame = {
    val profiles = Seq(
      ("en", Seq("the", "a", "and", "of", "to", "in", "is")),
      ("de", Seq("der", "die", "das", "und", "ist", "ein")),
      ("fr", Seq("le", "la", "les", "et", "est", "un")),
      ("es", Seq("el", "la", "los", "y", "es", "un")),
      ("zh", Seq("de", "shi", "le", "zai", "he")))
    val profRows = profiles.flatMap { case (l, ws) => ws.map(w => (l, w)) }
    val prof = s.createDataFrame(profRows).toDF("cand_lang", "tok")

    val tok = docs(s, dir)
      .select(col("doc_id"), size(tokens).as("n_tok"), explode(tokens).as("tok"))
    val best = tok.join(broadcast(prof), Seq("tok"))
      .groupBy(col("doc_id"), col("cand_lang"), col("n_tok"))
      .agg(count(lit(1)).as("hits"))
      .groupBy(col("doc_id"))
      .agg(max(struct((col("hits") / col("n_tok")).as("score"), col("cand_lang").as("lang"))).as("best"))
    // Docs with zero profile hits must still classify (as undetermined),
    // not silently drop out of the inner join.
    docs(s, dir).select(col("doc_id")).join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
              coalesce(col("best.lang"), lit("und")).as("detected_lang"),
              round(coalesce(col("best.score"), lit(0.0)), 4).as("lang_score"))
  }

  /** Content fingerprint: md5 over whitespace-normalized lowercase text —
    * the canonical-form dedup key. Exact twin in DuckDB (note the 'g' flag:
    * DuckDB regexp_replace is first-match by default, Spark is global). */
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    val normalized = regexp_replace(lower(trim(col("text"))), WsClass + "+", " ")
    docs(s, dir).select(
      col("doc_id"),
      md5(normalized).as("fp_md5"),
      length(normalized).cast("long").as("norm_len"))
  }

  val fingerprintSql: String =
    s"""SELECT doc_id,
      |  md5(regexp_replace(lower(trim(text)), '$WsClass+', ' ', 'g')) AS fp_md5,
      |  CAST(length(regexp_replace(lower(trim(text)), '$WsClass+', ' ', 'g')) AS BIGINT) AS norm_len
      |FROM documents""".stripMargin

  /** Corpus stats by (lang, source): doc counts and char-length moments.
    * `avg_chars` goes through [[OracleSafe.avgRound4]] — `round(avg(...))`
    * over longs is NOT engine-parity-safe (Spark's Average accumulates in
    * floating point; the 4th decimal diverged from DuckDB at sf0.01). */
  def corpusStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .select(col("lang"), col("source"), col("n_docs"),
              OracleSafe.avgRound4(col("total_chars"), col("n_docs")).as("avg_chars"),
              col("total_chars"))

  val corpusStatsSql: String =
    s"""SELECT lang, source, count(*) AS n_docs,
      |  ${OracleSafe.avgRound4Sql("sum(n_chars)", "count(*)")} AS avg_chars,
      |  sum(n_chars) AS total_chars
      |FROM documents GROUP BY lang, source""".stripMargin

  /** Repetition ratio: frequency of the most common token over total
    * tokens — high values flag boilerplate/spam docs (a standard pipeline
    * quality gate). Explode → two-level aggregation; the shuffle carries
    * (doc, token) partial counts. */
  def repetitionRatio(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), size(tokens).as("n_tok"), explode(tokens).as("tok"))
      .groupBy(col("doc_id"), col("n_tok"), col("tok"))
      .agg(count(lit(1)).as("tok_count"))
      .groupBy(col("doc_id"), col("n_tok"))
      .agg(max(col("tok_count")).as("top_tok_count"))
      .select(col("doc_id"),
              col("top_tok_count"),
              round(col("top_tok_count") / col("n_tok"), 4).as("repetition_ratio"))

  val repetitionRatioSql: String =
    """WITH t AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
      |         unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |c AS (SELECT doc_id, n_tok, tok, count(*) AS tok_count FROM t GROUP BY 1, 2, 3)
      |SELECT doc_id, max(tok_count) AS top_tok_count,
      |       round(max(tok_count) * 1.0 / n_tok, 4) AS repetition_ratio
      |FROM c GROUP BY doc_id, n_tok""".stripMargin

  /** Unigram log-probability scoring (perplexity family): pass 1 computes
    * corpus word frequencies (a tiny broadcast table); pass 2 scores each
    * doc by its mean token log-probability. Low scores flag docs full of
    * corpus-rare tokens — the cheap statistical quality gate that precedes
    * model-based filtering in training pipelines. Two scans, one broadcast
    * join, no shuffle of document text. */
  def unigramLogProb(s: SparkSession, dir: String): DataFrame = {
    val tok = docs(s, dir).select(col("doc_id"), explode(tokens).as("tok"))
    // total token count derives from the frequency aggregation itself — as
    // a 1-row partial+final aggregate broadcast-cross-joined back, NOT an
    // unpartitioned window: Window.partitionBy() moves the whole vocab to
    // one task, a straggler when the vocabulary is billions of rows
    val tf = tok.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
    val total = tf.agg(sum(col("tf")).as("total"))
    val freqs = tf.crossJoin(broadcast(total))
      .select(col("tok"), (col("tf") / col("total")).as("p"))
    tok.join(broadcast(freqs), Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(round(avg(log(col("p"))), 4).as("mean_logprob"),
           count(lit(1)).as("n_scored"))
  }

  val unigramLogProbSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |freqs AS (
      |  SELECT tok, count(*) * 1.0 / (SELECT count(*) FROM tok) AS p
      |  FROM tok GROUP BY tok)
      |SELECT doc_id, round(avg(ln(p)), 4) AS mean_logprob, count(*) AS n_scored
      |FROM tok JOIN freqs USING (tok)
      |GROUP BY doc_id""".stripMargin

  /** GPT-2-family "BPE-ish" pre-tokenizer pattern — contraction suffixes,
    * space-prefixed letter/digit runs, punctuation runs, whitespace.
    * Deliberately restricted to syntax Java regex and RE2 (DuckDB) treat
    * identically: no lookarounds, no backrefs (RE2 has neither), and an
    * EXPLICIT whitespace class instead of `\s` — Java's `\s` includes
    * vertical tab (\x0B), RE2's does not, so `\s` would diverge on
    * exactly one control character. */
  val BpePattern: String =
    """'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^ \t\n\r\f\x0B\p{L}\p{N}]+|[ \t\n\r\f\x0B]+"""

  /** Token counting, BPE-ish tier: the subword-style pre-tokenization used
    * by LLM training pipelines for budget estimates — counts per doc plus
    * the whitespace-token count for comparison. Map-only, codegen'd
    * `regexp_extract_all`. */
  def bpeTokenCounts(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(BpePattern), lit(0))).cast("long").as("n_bpe_tokens"),
      size(regexp_extract_all(col("text"), lit(NonWsClass + "+"), lit(0))).cast("long").as("n_ws_tokens"))

  val bpeTokenCountsSql: String = {
    val sqlPat = BpePattern.replace("'", "''")
    s"""SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '$sqlPat')) AS BIGINT) AS n_bpe_tokens,
      |  CAST(len(regexp_extract_all(text, '$NonWsClass+')) AS BIGINT) AS n_ws_tokens
      |FROM documents""".stripMargin
  }

  /** Winnowing document fingerprints (the MOSS local-fingerprinting
    * algorithm, Schleimer et al., SIGMOD'03): Rabin-Karp rolling hash over
    * character k-grams, then per sliding window of `w` consecutive k-gram
    * hashes select the RIGHTMOST minimum — guarantees any match of length
    * ≥ w+k-1 between two docs shares a fingerprint, with expected density
    * 2/(w+1). Output is the distinct (doc_id, fp) set.
    *
    * Typed flatMap (guide tier (d)): the rolling hash + window minimum is
    * genuinely per-row imperative — higher-order-function lambdas evaluate
    * interpreted, and a SQL formulation would materialize every k-gram.
    * Map-only (no shuffle before the distinct, which is keyed by doc). */
  def winnowFingerprints(s: SparkSession, dir: String, k: Int = 5, w: Int = 4): DataFrame =
    winnowFingerprintsOf(s, docs(s, dir), k, w)

  /** Per-document winnowing core (pure — property-tested directly):
    * rolling k-gram hashes, rightmost-min per window of `w`, new selection
    * recorded when the selected POSITION changes (robust winnowing). */
  def winnow(text: String, k: Int = 5, w: Int = 4): Seq[Long] = {
    val n = text.length - k + 1
    if (n <= 0) Seq.empty
    else {
      val B = 1000003L
      var pow = 1L
      var i = 0
      while (i < k - 1) { pow *= B; i += 1 }
      val hs = new Array[Long](n)
      var h = 0L
      i = 0
      while (i < k) { h = h * B + text.charAt(i); i += 1 }
      hs(0) = graft.functions.MinHashSigAggregator.mix(h)
      i = 1
      while (i < n) {
        h = (h - text.charAt(i - 1) * pow) * B + text.charAt(i + k - 1)
        hs(i) = graft.functions.MinHashSigAggregator.mix(h)
        i += 1
      }
      val out = Seq.newBuilder[Long]
      var lastPos = -1
      var start = 0
      val lastStart = math.max(n - w, 0)
      while (start <= lastStart) {
        val end = math.min(start + w, n)
        var minPos = start
        var j = start + 1
        while (j < end) { if (hs(j) <= hs(minPos)) minPos = j; j += 1 }
        if (minPos != lastPos) { out += hs(minPos); lastPos = minPos }
        start += 1
      }
      out.result()
    }
  }

  /** [[winnowFingerprints]] over any `(doc_id, text)` DataFrame. */
  def winnowFingerprintsOf(s: SparkSession, documents: DataFrame, k: Int = 5, w: Int = 4): DataFrame = {
    import s.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) => winnow(text, k, w).map(fp => (id, fp)) }
      .toDF("doc_id", "fp").distinct()
  }

  /** Vocabulary builder: top-N tokens by corpus frequency with a
    * deterministic tie-break — the pre-pass of any tokenizer training.
    * Plans as partial+final agg then TakeOrderedAndProject (no global
    * sort), so it scales to billion-token vocabularies. */
  def vocab(s: SparkSession, dir: String, topN: Int = 500): DataFrame =
    docs(s, dir).select(explode(tokens).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("tok"))
      .limit(topN)

  val vocabSql: String =
    """SELECT tok, count(*) AS tf
      |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |GROUP BY tok ORDER BY tf DESC, tok LIMIT 500""".stripMargin

  /** Approximate token frequencies via Count-Min Sketch: ONE distributed
    * pass builds the sketch (`df.stat.countMinSketch` — mergeable counter
    * arrays, fixed size regardless of cardinality); the driver then probes
    * it for the top-`topN` vocab tokens, the k-means-centroids pattern of
    * "the model crosses to the driver, the corpus never does". CMS error
    * is one-sided: estimate ≥ true count, overcount ≤ eps × total tokens
    * with probability `confidence` (spec-tested). At 100 TB this answers
    * "how often does token X appear" without a vocabulary-sized shuffle. */
  def tokenFreqCms(s: SparkSession, dir: String, topN: Int = 100,
                   eps: Double = 0.001, confidence: Double = 0.99): DataFrame = {
    import s.implicits._
    val tok = docs(s, dir).select(explode(tokens).as("tok"))
    val cms = tok.stat.countMinSketch("tok", eps, confidence, seed = 42)
    vocab(s, dir, topN).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), cms.estimateCount(r.getString(0))))
      .toDF("tok", "tf_exact", "tf_cms")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_unigram_logprob" -> (unigramLogProb _),
    "q_text_repetition" -> (repetitionRatio _),
    "q_text_tokens" -> (tokenCounts _),
    "q_text_bpe_tokens" -> (bpeTokenCounts _),
    "q_text_winnow" -> ((s: SparkSession, d: String) => winnowFingerprints(s, d)),
    "q_text_quality" -> (qualityScore _),
    "q_text_langid" -> (languageId _),
    "q_text_fingerprint" -> (fingerprint _),
    "q_text_corpus_stats" -> (corpusStats _),
    "q_text_vocab" -> ((s: SparkSession, d: String) => vocab(s, d)),
    "q_text_cms_freq" -> ((s: SparkSession, d: String) => tokenFreqCms(s, d)))

  val oracles: Map[String, String] = Map(
    "q_text_unigram_logprob" -> unigramLogProbSql,
    "q_text_repetition" -> repetitionRatioSql,
    "q_text_tokens" -> tokenCountsSql,
    "q_text_bpe_tokens" -> bpeTokenCountsSql,
    "q_text_quality" -> qualityScoreSql,
    "q_text_fingerprint" -> fingerprintSql,
    "q_text_corpus_stats" -> corpusStatsSql,
    "q_text_vocab" -> vocabSql)
}
