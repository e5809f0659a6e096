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

  /** The combined [0,1] quality expression over a text column — shared by
    * the batch [[qualityScore]] query and the streaming ingest pipeline
    * ([[graft.streaming.DocPipeline]]): length gate × (1 − stopword
    * ratio). Unrounded; callers round for oracle export. */
  def qualityCol(text: Column): Column = {
    val toks = split(text, " ")
    val nTok = size(toks).cast("double")
    val stopTok = size(filter(toks, t => t.isin("the", "a"))).cast("double")
    least(nTok / lit(100.0), lit(1.0)) * (lit(1.0) - stopTok / nTok)
  }

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
      round(qualityCol(col("text")), 4).as("quality"))
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

  /** Stopword profiles for [[languageId]] — shared with the DuckDB oracle
    * builder so both engines score the identical literal table. */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    ("en", Seq("the", "a", "and", "of", "to", "in", "is")),
    ("de", Seq("der", "die", "das", "und", "ist", "ein")),
    ("fr", Seq("le", "la", "les", "et", "est", "un")),
    ("es", Seq("el", "la", "los", "y", "es", "un")),
    ("zh", Seq("de", "shi", "le", "zai", "he")))

  /** Stopword-profile language ID (n-gram-heuristic family): score each
    * candidate language by the fraction of document tokens found in its
    * profile; argmax with deterministic tie-break. The profile table is a
    * literal broadcast dim; the aggregation shuffles only (doc_id, lang)
    * partial counts.
    *
    * ORACLE-SAFE by pure integer math: every language shares a doc's
    * `n_tok`, so the argmax orders by integer `hits` (then lang, both
    * engines identically), and the exported score goes through
    * [[OracleSafe.avgRound4]] — no float comparison anywhere. */
  def languageId(s: SparkSession, dir: String): DataFrame =
    languageIdOn(s, docs(s, dir))

  /** [[languageId]] over any `(doc_id, text)` DataFrame (spec harness for
    * head-to-head accuracy against [[languageIdTrigram]]). */
  def languageIdOn(s: SparkSession, documents: DataFrame): DataFrame = {
    val profRows = StopwordProfiles.flatMap { case (l, ws) => ws.map(w => (l, w)) }
    val prof = s.createDataFrame(profRows).toDF("cand_lang", "tok")

    val tok = documents
      .select(col("doc_id"), size(tokens).as("n_tok"), explode(tokens).as("tok"))
    val best = tok.join(broadcast(prof), Seq("tok"))
      .groupBy(col("doc_id"), col("cand_lang"), col("n_tok"))
      .agg(count(lit(1)).as("hits"))
      .groupBy(col("doc_id"))
      // same n_tok across languages per doc ⇒ hits alone decides; struct
      // max ties toward the lexicographically-largest language
      .agg(max(struct(col("hits"), col("cand_lang").as("lang"))).as("best"),
           first(col("n_tok")).as("n_tok"))
    // Docs with zero profile hits must still classify (as undetermined),
    // not silently drop out of the inner join.
    documents.select(col("doc_id")).join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
              coalesce(col("best.lang"), lit("und")).as("detected_lang"),
              when(col("best.hits").isNull, lit(0.0))
                .otherwise(OracleSafe.avgRound4(col("best.hits"), col("n_tok")))
                .as("lang_score"))
  }

  /** DuckDB twin of [[languageId]] (profiles embedded as a VALUES list). */
  val languageIdSql: String = {
    val values = StopwordProfiles
      .flatMap { case (l, ws) => ws.map(w => s"('$l', '$w')") }.mkString(", ")
    s"""WITH prof(cand_lang, tok) AS (VALUES $values),
      |tok AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
      |         unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |hits AS (
      |  SELECT doc_id, cand_lang, n_tok, count(*) AS hits
      |  FROM tok JOIN prof USING (tok)
      |  GROUP BY 1, 2, 3),
      |best AS (
      |  SELECT doc_id, cand_lang, n_tok, hits,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand_lang DESC) AS rn
      |  FROM hits)
      |SELECT d.doc_id,
      |  coalesce(b.cand_lang, 'und') AS detected_lang,
      |  CASE WHEN b.hits IS NULL THEN 0.0
      |       ELSE ${OracleSafe.avgRound4Sql("b.hits", "b.n_tok")} END AS lang_score
      |FROM documents d
      |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)""".stripMargin
  }

  /** Character-trigram language model for language ID — the n-gram text
    * categorization family (Cavnar & Trenkle, "N-Gram-Based Text
    * Categorization", SDAIR'94), scored as an add-one-smoothed trigram
    * unigram-LM instead of rank distance (same DataFrame shape either
    * way). Profiles are TRAINED at class-init from the small embedded
    * literal corpora below — no external files, no network. */
  object TrigramLangId {
    /** Tiny per-language training corpora (original sample sentences in
      * each language's everyday vocabulary; `zh` is pinyin to match the
      * latin-script synthetic corpus). Held-out spec sentences in
      * LangIdSpec deliberately share no sentence with these. */
    val TrainCorpus: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq(
        "the quick brown fox jumps over the lazy dog",
        "she said that the weather would be fine this afternoon",
        "a long time ago people traveled across the sea in wooden ships",
        "the children were playing in the garden behind the old house",
        "we should think about what this means for the future of the city",
        "most of the books on that shelf have never been read by anyone",
        "please put the data from the first column into a new table",
        "a fast train passed the small station without stopping at all",
        "the value of each order depends on the size of the batch",
        "draw a line from the first row down to the last column",
        "the stream runs past the mill and joins the big river",
        "sort the cards by color and keep the key on the table"),
      "de" -> Seq(
        "der schnelle braune fuchs springt ueber den faulen hund",
        "sie sagte dass das wetter heute nachmittag schoen werden wuerde",
        "vor langer zeit reisten die menschen in hoelzernen schiffen ueber das meer",
        "die kinder spielten im garten hinter dem alten haus",
        "wir sollten darueber nachdenken was das fuer die zukunft der stadt bedeutet",
        "die meisten buecher in diesem regal wurden noch nie von jemandem gelesen"),
      "fr" -> Seq(
        "le renard brun rapide saute par dessus le chien paresseux",
        "elle a dit que le temps serait beau cet apres midi",
        "il y a longtemps les gens traversaient la mer dans des navires en bois",
        "les enfants jouaient dans le jardin derriere la vieille maison",
        "nous devrions penser a ce que cela signifie pour avenir de la ville",
        "la plupart des livres sur cette etagere ont jamais ete lus par personne"),
      "es" -> Seq(
        "el rapido zorro marron salta sobre el perro perezoso",
        "ella dijo que el tiempo estaria bueno esta tarde",
        "hace mucho tiempo la gente cruzaba el mar en barcos de madera",
        "los ninos jugaban en el jardin detras de la casa vieja",
        "deberiamos pensar en lo que esto significa para el futuro de la ciudad",
        "la mayoria de los libros en ese estante nunca han sido leidos por nadie"),
      "zh" -> Seq(
        "wo men jin tian xia wu qu gong yuan san bu",
        "ta shuo jin tian xia wu tian qi hui hen hao",
        "hen jiu yi qian ren men zuo mu chuan guo hai",
        "hai zi men zai lao fang zi hou mian de hua yuan li wan",
        "wo men ying gai xiang xiang zhe dui cheng shi de wei lai yi wei zhe shen me",
        "na ge shu jia shang de da duo shu shu cong lai mei you ren du guo"))

    /** Lowercase, strip non-letters, collapse runs, pad — identical on the
      * training (driver) and scoring (executor) paths. */
    def normalize(t: String): String =
      " " + t.toLowerCase.replaceAll("[^\\p{L}]+", " ").trim + " "

    def trigrams(normalized: String): Iterator[String] =
      if (normalized.length < 3) Iterator.empty
      else (0 to normalized.length - 3).iterator.map(i => normalized.substring(i, i + 3))

    /** `(lang, trigram, logp)` rows with add-one smoothing, plus the
      * unseen-trigram floor. Vocabulary = union of trigrams across all
      * languages. The floor is SHARED across languages (computed from the
      * largest corpus so it sits below every seen log-prob): a per-language
      * `log(1/(total_l + V))` floor penalizes the language with the LARGEST
      * training corpus hardest on out-of-vocabulary text, which anti-biases
      * exactly the best-trained profile; a shared floor makes unseen
      * trigrams argmax-neutral so only seen evidence discriminates. */
    lazy val (profileRows, floorRows): (Seq[(String, String, Double)], Seq[(String, Double)]) = {
      val counts: Seq[(String, Map[String, Long])] = TrainCorpus.map { case (lang, sents) =>
        lang -> sents.flatMap(s => trigrams(normalize(s)))
          .groupBy(identity).map { case (g, gs) => g -> gs.size.toLong }
      }
      val vocabSize = counts.flatMap(_._2.keys).distinct.size
      val profs = counts.flatMap { case (lang, c) =>
        val total = c.values.sum
        c.toSeq.map { case (g, n) =>
          (lang, g, math.log((n + 1).toDouble / (total + vocabSize + 1)))
        }
      }
      val sharedFloor = math.log(1.0 / (counts.map(_._2.values.sum).max + vocabSize + 1))
      val floors = counts.map { case (lang, _) => (lang, sharedFloor) }
      (profs, floors)
    }
  }

  /** Trigram-LM language ID: per doc, mean trigram log-probability under
    * each candidate language's profile; argmax with deterministic
    * tie-break.
    *
    * Shape: the trigram stream inner-joins the broadcast profile ONCE
    * (matched trigrams only); the unseen-floor mass is reconstructed
    * arithmetically as `floor × (n_tri − n_matched)` — the floor is shared
    * across languages, so unmatched trigrams never need to be enumerated
    * per language. The naive formulation (cross every trigram occurrence
    * with every language, left-join, average) processes |langs|× the
    * trigram stream; this one touches each trigram once and only crosses
    * at per-DOC granularity (docs × langs rows). The only shuffles carry
    * `(doc_id, cand_lang)` partial sums and per-doc counts — map-side
    * combined, no text shuffle. Trigram extraction is a typed flatMap (HOF
    * lambdas evaluate interpreted — same tier-(d) call as
    * [[winnowFingerprints]]). */
  def languageIdTrigramOn(s: SparkSession, documents: DataFrame): DataFrame = {
    import s.implicits._
    val prof = s.createDataFrame(TrigramLangId.profileRows).toDF("cand_lang", "tri", "logp")
    val langs = s.createDataFrame(TrigramLangId.floorRows).toDF("cand_lang", "floor_logp")
    val tris = documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, t) =>
        TrigramLangId.trigrams(TrigramLangId.normalize(t)).map(g => (id, g))
      }.toDF("doc_id", "tri")
    val counts = tris.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tri"))
    val matched = tris.join(broadcast(prof), Seq("tri"))
      .groupBy(col("doc_id"), col("cand_lang"))
      .agg(sum(col("logp")).as("sum_lp"), count(lit(1)).as("n_matched"))
    val scored = counts.crossJoin(broadcast(langs)) // docs × |langs| rows
      .join(matched, Seq("doc_id", "cand_lang"), "left")
      .select(col("doc_id"), col("cand_lang"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        ((coalesce(col("sum_lp"), lit(0.0)) +
          col("floor_logp") * (col("n_tri") - coalesce(col("n_matched"), lit(0L))))
          / col("n_tri")).as("mean_lp"))
    // n_matched_total = 0 means NO trigram matched ANY profile (e.g. a
    // non-Latin script): all five languages tie at the shared floor and the
    // struct-max would arbitrarily report the alphabetically-last language
    // with a confident-looking score — classify as "und" instead, like the
    // stopword heuristic's zero-evidence fallback
    val best = scored.groupBy(col("doc_id"))
      .agg(max(struct(col("mean_lp").as("score"), col("cand_lang").as("lang"))).as("best"),
           sum(col("n_matched")).as("n_matched_total"))
    val hasEvidence = coalesce(col("n_matched_total"), lit(0L)) > 0
    documents.select(col("doc_id")).join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
              when(hasEvidence, col("best.lang")).otherwise(lit("und")).as("detected_lang"),
              when(hasEvidence, round(col("best.score"), 4)).otherwise(lit(0.0)).as("lang_score"))
  }

  def languageIdTrigram(s: SparkSession, dir: String): DataFrame =
    languageIdTrigramOn(s, docs(s, dir))

  /** md5 over whitespace-normalized lowercase text — the canonical-form
    * dedup key, reusable on any text column (batch fingerprinting here,
    * stream-side fingerprinting in `StreamDedup.againstCorpus`). */
  def fpMd5(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), WsClass + "+", " "))

  /** Content fingerprint: md5 over whitespace-normalized lowercase text —
    * the canonical-form dedup key. Exact twin in DuckDB (note the 'g' flag:
    * DuckDB regexp_replace is first-match by default, Spark is global). */
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    val normalized = regexp_replace(lower(trim(col("text"))), WsClass + "+", " ")
    docs(s, dir).select(
      col("doc_id"),
      fpMd5(col("text")).as("fp_md5"),
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

  // CAST is load-bearing: DuckDB widens sum(BIGINT) to HUGEINT, which the
  // driver's pandas bridge materializes as float64 (662.0 vs Spark's int64
  // 662) — rows/schema match but the value hash diverges on every row.
  val corpusStatsSql: String =
    s"""SELECT lang, source, count(*) AS n_docs,
      |  ${OracleSafe.avgRound4Sql("CAST(sum(n_chars) AS BIGINT)", "count(*)")} AS avg_chars,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY lang, source""".stripMargin

  /** Per-source document-length outliers — the distribution-based quality
    * gate (docs wildly longer/shorter than their source's norm are
    * boilerplate/truncation suspects). Flags `|x − μ| > 2σ` per source,
    * but the test is EXACT integer arithmetic:
    * `(n·x − S)² > 4·(n·Q − S²)` with `S = Σx, Q = Σx²` — algebraically
    * `z² > 4` with population variance, and no float mean/stddev ever
    * materializes (stddev aggregates are accumulation-order-dependent, so
    * a double formulation can't hash-match across engines). One tiny
    * per-source stats aggregate broadcast back over the scan.
    *
    * EVERYTHING runs in DECIMAL(38,0), including the aggregation
    * accumulators: the binding terms are Q = Σx², S², and (n·x−S)², which
    * leave int64 once a group's sum-of-squares passes ~9·10¹⁸ (≈10¹⁵
    * total chars at 10⁴-char docs) — a plain `sum(x*x)` would silently
    * wrap in Spark while DuckDB's HUGEINT stays exact, and the flags
    * would silently diverge. Casting to decimal only AFTER aggregation
    * (the round-4 formulation) did not protect Q; casting each x BEFORE
    * the sums makes the accumulators themselves exact. Decimal(38) and
    * HUGEINT share the envelope to ~10¹⁸ in the squared terms' inputs —
    * far past any per-source corpus. */
  def lengthOutliers(s: SparkSession, dir: String): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val d = docs(s, dir).select(col("doc_id"), col("source"), col("n_chars"))
    // decimal(19,0) per-row factors keep the product precision (39 → 38
    // under Spark's precision-loss rule, scale 0, no rounding possible)
    // while the SUM accumulator widens to decimal(38,0) — exact
    val x = col("n_chars").cast("decimal(19,0)")
    val stats = d.groupBy(col("source")).agg(
      count(lit(1)).as("n"),
      sum(dec(col("n_chars"))).as("sx"),
      sum(x * x).as("qx"))
    val dev = dec(col("n")) * dec(col("n_chars")) - dec(col("sx"))
    d.join(broadcast(stats), Seq("source"))
      .select(col("doc_id"), col("source"), col("n_chars"),
              (dev * dev >
                lit(4) * (dec(col("n")) * dec(col("qx")) - dec(col("sx")) * dec(col("sx"))))
                .as("is_outlier"))
  }

  // DuckDB's HUGEINT widening IS the decimal(38) twin here: only the
  // BOOLEAN crosses to the driver, and both widths are exact in the
  // documented envelope
  val lengthOutliersSql: String =
    """WITH st AS (
      |  SELECT source, count(*) AS n, sum(n_chars) AS sx,
      |         sum(n_chars * n_chars) AS qx
      |  FROM documents GROUP BY 1)
      |SELECT d.doc_id, d.source, d.n_chars,
      |  (st.n * d.n_chars - st.sx) * (st.n * d.n_chars - st.sx)
      |    > 4 * (st.n * st.qx - st.sx * st.sx) AS is_outlier
      |FROM documents d JOIN st USING (source)""".stripMargin

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

  /** Duplicate-n-gram character fractions — the Gopher-family repetition
    * signals (Rae et al., "Scaling Language Models: … Gopher", 2021,
    * §A1.1: fraction of characters in duplicated n-grams / in the most
    * frequent n-gram), the word-level complement of the top-token
    * [[repetitionRatio]]. Definitions pinned for engine parity:
    * an n-gram's char weight is the length of its space-joined string;
    * `dup{2,3}_chars` sums `count × weight` over grams occurring ≥ 2
    * times in the doc; `top2_chars` is `max(count × weight)` over
    * 2-grams (an integer, so the argmax needs no cross-engine float or
    * hash tie-break). Fractions of `length(text)` export via
    * [[OracleSafe.avgRound4]].
    *
    * Shape: one typed flatMap emits (doc, n, gram-hash, weight) — 64-bit
    * hashed grams keep shuffle rows fixed-width (the [[Dedup.spanDupStats]]
    * trade: the oracle groups the strings; a collision merging two grams
    * of one doc is ~q²/2⁶⁴ per doc); two keyed aggregations. */
  def dupNgramStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grams = docs(s, dir).select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, t) =>
        val w = t.split(" ", -1)
        (2 to 3).iterator.flatMap { n =>
          (0 to w.length - n).iterator.map { i =>
            val g = w.slice(i, i + n).mkString(" ")
            // CODE-POINT length, not String.length: SQL length() counts
            // code points in both engines, and total_chars below is code
            // points — UTF-16 units would double-count non-BMP chars
            (id, n, graft.functions.Hll.hash(g), g.codePointCount(0, g.length).toLong)
          }
        }
      }.toDF("doc_id", "n", "gram_h", "glen")
    val counts = grams.groupBy(col("doc_id"), col("n"), col("gram_h"), col("glen"))
      .agg(count(lit(1)).as("cnt"))
    val perDoc = counts.groupBy(col("doc_id")).agg(
      sum(when(col("n") === 2 && col("cnt") >= 2, col("cnt") * col("glen"))
        .otherwise(0L)).as("dup2_chars"),
      sum(when(col("n") === 3 && col("cnt") >= 2, col("cnt") * col("glen"))
        .otherwise(0L)).as("dup3_chars"),
      coalesce(max(when(col("n") === 2, col("cnt") * col("glen"))), lit(0L)).as("top2_chars"))
    docs(s, dir).select(col("doc_id"), length(col("text")).cast("long").as("total_chars"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("total_chars"),
        coalesce(col("dup2_chars"), lit(0L)).as("dup2_chars"),
        coalesce(col("dup3_chars"), lit(0L)).as("dup3_chars"),
        coalesce(col("top2_chars"), lit(0L)).as("top2_chars"),
        // empty-text guard: avgRound4's integer division raises
        // DIVIDE_BY_ZERO under ANSI mode where DuckDB's `// 0` nulls —
        // define the empty doc's fractions as 0.0 on both sides
        when(col("total_chars") > 0,
          OracleSafe.avgRound4(coalesce(col("dup2_chars"), lit(0L)), col("total_chars")))
          .otherwise(lit(0.0)).as("dup2_frac"),
        when(col("total_chars") > 0,
          OracleSafe.avgRound4(coalesce(col("dup3_chars"), lit(0L)), col("total_chars")))
          .otherwise(lit(0.0)).as("dup3_frac"))
  }

  val dupNgramStatsSql: String = {
    def gramCte(n: Int) =
      s"""SELECT doc_id, $n AS n,
        |    array_to_string(w[i:(i + ${n - 1})], ' ') AS gram
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - ${n - 2})) AS i FROM toks)""".stripMargin
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |grams AS (
      |  ${gramCte(2)}
      |  UNION ALL
      |  ${gramCte(3)}),
      |c AS (
      |  SELECT doc_id, n, gram, count(*) AS cnt, length(gram) AS glen
      |  FROM grams GROUP BY doc_id, n, gram),
      |p AS (
      |  SELECT doc_id,
      |    CAST(coalesce(sum(CASE WHEN n = 2 AND cnt >= 2 THEN cnt * glen ELSE 0 END), 0) AS BIGINT) AS dup2_chars,
      |    CAST(coalesce(sum(CASE WHEN n = 3 AND cnt >= 2 THEN cnt * glen ELSE 0 END), 0) AS BIGINT) AS dup3_chars,
      |    CAST(coalesce(max(CASE WHEN n = 2 THEN cnt * glen END), 0) AS BIGINT) AS top2_chars
      |  FROM c GROUP BY doc_id)
      |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS total_chars,
      |  coalesce(p.dup2_chars, 0) AS dup2_chars,
      |  coalesce(p.dup3_chars, 0) AS dup3_chars,
      |  coalesce(p.top2_chars, 0) AS top2_chars,
      |  CASE WHEN length(d.text) > 0
      |    THEN ${OracleSafe.avgRound4Sql("coalesce(p.dup2_chars, 0)", "CAST(length(d.text) AS BIGINT)")}
      |    ELSE 0.0 END AS dup2_frac,
      |  CASE WHEN length(d.text) > 0
      |    THEN ${OracleSafe.avgRound4Sql("coalesce(p.dup3_chars, 0)", "CAST(length(d.text) AS BIGINT)")}
      |    ELSE 0.0 END AS dup3_frac
      |FROM documents d LEFT JOIN p USING (doc_id)""".stripMargin
  }

  /** Gopher-family quality gates (Rae et al., "Scaling Language Models:
    * … Gopher", 2021, §A1.1) — the rule-based document filter battery that
    * complements the repetition signals in [[dupNgramStats]]:
    * word-count bounds, mean-word-length bounds, symbol-to-word ratio
    * (# and …), bullet-start / ellipsis-end line fractions, fraction of
    * words with an alphabetic character, and the min-stop-word gate
    * (≥ 2 distinct of Gopher's 8 English function words).
    *
    * Every GATE decision is pure integer arithmetic (`3·n ≤ Σlen ≤ 10·n`
    * instead of a float mean, `10·symbols ≤ n` instead of a ratio) so the
    * booleans are engine-exact; the exported diagnostic ratios go through
    * [[OracleSafe.avgRound4]]. Map-only — one projection pass, no shuffle,
    * no UDF: `regexp_extract_all` + array higher-order functions, all
    * RE2-portable per the [[WsClass]] discipline. */
  def gopherGates(s: SparkSession, dir: String): DataFrame =
    gopherGatesOn(s, docs(s, dir))

  /** [[gopherGates]] over any `(doc_id, text)` DataFrame — the composable
    * form ([[Curation]] feeds it the dedup-collapsed corpus). `carry`
    * names extra input columns to thread through the stats projection, so
    * a composition can compute its own per-doc columns (source, token
    * count) in the SAME scan as the gates instead of re-joining and
    * re-splitting the text afterwards. */
  def gopherGatesOn(s: SparkSession, documents: DataFrame,
                    carry: Seq[String] = Nil): DataFrame = {
    val words = regexp_extract_all(col("text"), lit(NonWsClass + "+"), lit(0))
    val lines = split(col("text"), "\n")
    val carried = carry.map(col)
    val d = documents.select(Seq(
      col("doc_id"),
      size(words).cast("long").as("n_words"),
      aggregate(words, lit(0L), (acc, w) => acc + length(w)).as("word_chars"),
      (size(regexp_extract_all(col("text"), lit("#"), lit(0))) +
        size(regexp_extract_all(col("text"), lit("""\.\.\."""), lit(0))))
        .cast("long").as("n_symbols"),
      size(lines).cast("long").as("n_lines"),
      size(filter(lines, l => l.rlike("^[-*•]"))).cast("long").as("bullet_lines"),
      size(filter(lines, l => l.rlike("""(\.\.\.|…)$"""))).cast("long").as("ellipsis_lines"),
      size(filter(words, w => w.rlike("""\p{L}"""))).cast("long").as("alpha_words"),
      size(array_intersect(words,
        array(GopherStopwords.map(lit): _*))).cast("long").as("stop_hits")) ++ carried: _*)
    d.select(Seq(
      col("doc_id"), col("n_words"), col("word_chars"), col("n_symbols"),
      col("n_lines"), col("bullet_lines"), col("ellipsis_lines"),
      col("alpha_words"), col("stop_hits"),
      when(col("n_words") > 0, OracleSafe.avgRound4(col("word_chars"), col("n_words")))
        .otherwise(lit(0.0)).as("mean_word_len"),
      when(col("n_words") > 0, OracleSafe.avgRound4(col("n_symbols"), col("n_words")))
        .otherwise(lit(0.0)).as("symbol_ratio"),
      // the gates — integer formulations of Gopher §A1.1's thresholds
      (col("n_words") >= 50 && col("n_words") <= 100000L).as("gate_word_count"),
      (lit(3L) * col("n_words") <= col("word_chars") &&
        col("word_chars") <= lit(10L) * col("n_words")).as("gate_word_len"),
      (lit(10L) * col("n_symbols") <= col("n_words")).as("gate_symbol"),
      (lit(10L) * col("bullet_lines") <= lit(9L) * col("n_lines")).as("gate_bullet"),
      (lit(10L) * col("ellipsis_lines") <= lit(3L) * col("n_lines")).as("gate_ellipsis"),
      (lit(5L) * col("alpha_words") >= lit(4L) * col("n_words")).as("gate_alpha"),
      (col("stop_hits") >= 2).as("gate_stop")) ++ carried: _*)
      .withColumn("passes_all",
        col("gate_word_count") && col("gate_word_len") && col("gate_symbol") &&
          col("gate_bullet") && col("gate_ellipsis") && col("gate_alpha") && col("gate_stop"))
  }

  /** Gopher §A1.1's stop-word gate list (Rae et al. 2021). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** All gate column names, in [[gopherGatesOn]]'s output order. */
  val GopherGateNames: Seq[String] = Seq(
    "gate_word_count", "gate_word_len", "gate_symbol", "gate_bullet",
    "gate_ellipsis", "gate_alpha", "gate_stop")

  /** Per-gate SQL predicate over the stats columns [[gopherStatsSqlCols]]
    * emits — the ONE home of the gate thresholds on the oracle side.
    * Every oracle that gates ([[gopherGatesSql]] and [[Curation]]'s)
    * assembles from this map; a threshold change then updates the Scala
    * side ([[gopherGatesOn]]) and ALL oracles together. */
  val gopherGateSqlByName: Map[String, String] = Map(
    "gate_word_count" -> "n_words >= 50 AND n_words <= 100000",
    "gate_word_len" -> "3 * n_words <= word_chars AND word_chars <= 10 * n_words",
    "gate_symbol" -> "10 * n_symbols <= n_words",
    "gate_bullet" -> "10 * bullet_lines <= 9 * n_lines",
    "gate_ellipsis" -> "10 * ellipsis_lines <= 3 * n_lines",
    "gate_alpha" -> "5 * alpha_words >= 4 * n_words",
    "gate_stop" -> "stop_hits >= 2")

  /** The integer stats every gate reads, as DuckDB SQL column definitions
    * over `textExpr` — shared by [[gopherGatesSql]] and [[Curation]]'s
    * oracle so the stat derivations cannot drift apart. */
  def gopherStatsSqlCols(textExpr: String): String = {
    val stopList = GopherStopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""CAST(len(regexp_extract_all($textExpr, '$NonWsClass+')) AS BIGINT) AS n_words,
      |    CAST(coalesce(list_sum(list_transform(
      |      regexp_extract_all($textExpr, '$NonWsClass+'), w -> length(w))), 0) AS BIGINT) AS word_chars,
      |    CAST(len(regexp_extract_all($textExpr, '#'))
      |       + len(regexp_extract_all($textExpr, '\\.\\.\\.')) AS BIGINT) AS n_symbols,
      |    CAST(len(string_split($textExpr, chr(10))) AS BIGINT) AS n_lines,
      |    CAST(len(list_filter(string_split($textExpr, chr(10)),
      |      l -> regexp_matches(l, '^[-*•]'))) AS BIGINT) AS bullet_lines,
      |    CAST(len(list_filter(string_split($textExpr, chr(10)),
      |      l -> regexp_matches(l, '(\\.\\.\\.|…)$$'))) AS BIGINT) AS ellipsis_lines,
      |    CAST(len(list_filter(regexp_extract_all($textExpr, '$NonWsClass+'),
      |      w -> regexp_matches(w, '\\p{L}'))) AS BIGINT) AS alpha_words,
      |    CAST(len(list_intersect(regexp_extract_all($textExpr, '$NonWsClass+'),
      |      $stopList)) AS BIGINT) AS stop_hits""".stripMargin
  }

  val gopherGatesSql: String = {
    val gateCols = GopherGateNames
      .map(n => s"  ${gopherGateSqlByName(n)} AS $n,").mkString("\n")
    val passesAll = GopherGateNames.map(gopherGateSqlByName)
      .mkString("\n    AND ")
    s"""WITH g AS (
      |  SELECT doc_id,
      |    ${gopherStatsSqlCols("text")}
      |  FROM documents)
      |SELECT doc_id, n_words, word_chars, n_symbols, n_lines, bullet_lines,
      |  ellipsis_lines, alpha_words, stop_hits,
      |  CASE WHEN n_words > 0
      |    THEN ${OracleSafe.avgRound4Sql("word_chars", "n_words")} ELSE 0.0 END AS mean_word_len,
      |  CASE WHEN n_words > 0
      |    THEN ${OracleSafe.avgRound4Sql("n_symbols", "n_words")} ELSE 0.0 END AS symbol_ratio,
      |$gateCols
      |  $passesAll AS passes_all
      |FROM g""".stripMargin
  }

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

  /** Winnow rolling-hash parameters: Rabin-Karp base and a 2³⁰ modulus.
    * The modulus keeps every intermediate inside overflow-checked BIGINT
    * arithmetic, which is what lets the DuckDB oracle recompute hashes by
    * the direct per-position formula — a wrapping 2⁶⁴ hash (the previous
    * formulation) is inexpressible there. 2³⁰ buckets over ≤ thousands of
    * k-grams per document keeps within-window collisions negligible, and
    * the MOSS guarantee is hash-independent anyway (identical strings
    * hash identically under any function). */
  val WinnowBase = 1000003L
  val WinnowMod = 1L << 30

  /** Per-document winnowing core (pure — property-tested directly):
    * rolling k-gram hashes, rightmost-min per window of `w`, new selection
    * recorded when the selected POSITION changes (robust winnowing).
    *
    * Hashes run over Unicode CODE POINTS, not UTF-16 units: SQL `length`/
    * `substr`/`ascii` are all code-point-indexed, so a charAt formulation
    * (the round-4 version) silently breaks oracle parity on any document
    * containing a non-BMP character (emoji split into surrogate halves and
    * the two engines hash different k-gram streams). Code points make the
    * fingerprints encoding-independent — UTF-8-robustness verified by the
    * `fixtures` UTF-8 corpus gate and the Utf8Spec parity test. */
  def winnow(text: String, k: Int = 5, w: Int = 4): Seq[Long] = {
    val cps = text.codePoints().toArray
    val n = cps.length - k + 1
    if (n <= 0) Seq.empty
    else {
      val B = WinnowBase
      val M = WinnowMod
      var pow = 1L
      var i = 0
      while (i < k - 1) { pow = pow * B % M; i += 1 }
      val hs = new Array[Long](n)
      var h = 0L
      i = 0
      while (i < k) { h = (h * B + cps(i)) % M; i += 1 }
      hs(0) = h
      i = 1
      while (i < n) {
        h = ((h - cps(i - 1).toLong * pow % M + M) % M * B + cps(i + k - 1)) % M
        hs(i) = h
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

  /** DuckDB twin of [[winnowFingerprints]]. The robust-winnowing
    * position-change suppression only avoids re-emitting the SAME
    * selection, so the distinct emitted-VALUE set equals the distinct set
    * of per-window minimum hash values — which SQL computes directly:
    * per-position k-gram hashes by the direct polynomial formula
    * (`Σ cⱼ·Bᵏ⁻¹⁻ʲ mod M`, every term bounded far below 2⁶³), then a
    * sliding `min` window frame, then DISTINCT. DuckDB's `ascii(substr(…))`
    * returns the CODE POINT at a code-point index — exactly what the Scala
    * side hashes — so parity holds on arbitrary Unicode text (accents,
    * CJK, non-BMP emoji), not just ASCII. */
  def winnowSql(k: Int = 5, w: Int = 4): String = {
    val pows = Seq.iterate(1L, k)(_ * WinnowBase % WinnowMod).reverse // B^{k-1} … B^0 mod M
    // BIGINT cast before the multiply: ascii() is INT32 and INT32×INT32
    // overflows DuckDB's checked arithmetic at these power magnitudes
    val terms = pows.zipWithIndex.map { case (p, j) =>
      s"CAST(ascii(substr(text, CAST(i + $j AS INT), 1)) AS BIGINT) * $p"
    }.mkString("\n     + ")
    s"""WITH pos AS (
      |  SELECT doc_id, text, CAST(length(text) - $k + 1 AS BIGINT) AS n,
      |         unnest(range(1, length(text) - ${k - 2})) AS i
      |  FROM documents WHERE length(text) >= $k),
      |h AS (
      |  SELECT doc_id, n, i,
      |    ($terms) % $WinnowMod AS hv
      |  FROM pos),
      |wm AS (
      |  SELECT doc_id, n, i,
      |    min(hv) OVER (PARTITION BY doc_id ORDER BY i
      |      ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS fp
      |  FROM h)
      |SELECT DISTINCT doc_id, fp FROM wm
      |WHERE i <= greatest(n - $w, 0) + 1""".stripMargin
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

  /** Portable-hash CMS twin (round 10): the SAME count-min semantics —
    * depth×width counters, each row hashed by an independent 2-universal
    * function, estimate = min over depth of the bucket totals — but the
    * hash family is the repo's [[graft.functions.PolyHash]] permutation
    * family (the MinHash constants, rows 0..depth−1), so the ENTIRE
    * sketch is reproducible in DuckDB and the query is hash-gated
    * end-to-end (`q_text_cms_freq` stays registered as the Spark-built-in
    * tier, rows-only by its engine-private hashes — §8.6). The sketch
    * here is DATA, not a driver object: the depth×width counter table is
    * a keyed agg (bounded size regardless of corpus), estimates come from
    * one broadcast-sized join against it, and nothing corpus-grain ever
    * reaches the driver — the formulation a 100 TB "how often does token
    * X appear" scan wants. Counter identity: `counters(d, bkt) = Σ tf` of
    * all vocabulary rows hashing there, which equals streaming per-token
    * increments (addition is associative) — so this IS the CMS, not an
    * approximation of it. */
  def tokenFreqCmsPoly(s: SparkSession, dir: String, topN: Int = 100,
                       depth: Int = 4, width: Int = 2048): DataFrame = {
    import s.implicits._
    import graft.functions.PolyHash
    import graft.functions.MinHashSigAggregator.{PermA, PermB, PermC}
    require(depth <= graft.functions.MinHashSigAggregator.MaxPerms)
    val tf = docs(s, dir).select(explode(tokens).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("tf_exact"))
    // vocab-grain typed flatMap (guide tier (d), same justification as
    // segmentVocab: imperative per-token hashing at vocabulary grain)
    val bucketed = tf.as[(String, Long)].flatMap { case (tok, n) =>
      val h = PolyHash.packed60(tok)
      val hA = h >>> 30
      val hB = h & 1073741823L
      (0 until depth).map { d =>
        (tok, n, d.toLong,
          ((PermA(d) * hA + PermB(d) * hB + PermC(d)) % PolyHash.Mod) % width)
      }
    }.toDF("tok", "tf_exact", "d", "bkt")
    val counters = bucketed.groupBy(col("d"), col("bkt"))
      .agg(sum(col("tf_exact")).as("cnt"))
    bucketed.join(counters, Seq("d", "bkt"))
      .groupBy(col("tok"), col("tf_exact"))
      .agg(min(col("cnt")).as("tf_cms"))
      .orderBy(col("tf_exact").desc, col("tok")).limit(topN)
      .select(col("tok"), col("tf_exact"), col("tf_cms"))
  }

  /** DuckDB twin of [[tokenFreqCmsPoly]] — the full sketch: per-token
    * 30-bit polynomial hash halves, the shared permutation constants as a
    * VALUES list, bucket assignment, counter table, min-over-depth. */
  def tokenFreqCmsPolySql(topN: Int = 100, depth: Int = 4, width: Int = 2048): String = {
    import graft.functions.PolyHash.{Mod, BaseA, BaseB}
    val permVals = graft.functions.MinHashSigAggregator.permValuesSql(depth)
    s"""WITH tf AS (
       |  SELECT tok, count(*) AS tf_exact
       |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY tok),
       |h AS (
       |  SELECT tok, tf_exact,
       |    list_reduce(list_prepend(0::BIGINT, cps), (a, c) -> (a * $BaseA + c) % $Mod) AS ha,
       |    list_reduce(list_prepend(0::BIGINT, cps), (a, c) -> (a * $BaseB + c) % $Mod) AS hb
       |  FROM (SELECT tok, tf_exact,
       |          [ascii(x)::BIGINT for x in regexp_split_to_array(tok, '')] AS cps
       |        FROM tf)),
       |perms(p, a, b, c) AS (VALUES $permVals),
       |buckets AS (
       |  SELECT tok, tf_exact, p - 1 AS d,
       |         ((a * ha + b * hb + c) % $Mod) % $width AS bkt
       |  FROM h CROSS JOIN perms),
       |counters AS (
       |  SELECT d, bkt, CAST(sum(tf_exact) AS BIGINT) AS cnt
       |  FROM buckets GROUP BY 1, 2),
       |est AS (
       |  SELECT b.tok, b.tf_exact, min(c.cnt) AS tf_cms
       |  FROM buckets b JOIN counters c USING (d, bkt) GROUP BY 1, 2)
       |SELECT tok, CAST(tf_exact AS BIGINT) AS tf_exact, tf_cms
       |FROM est ORDER BY tf_exact DESC, tok LIMIT $topN""".stripMargin
  }

  // -----------------------------------------------------------------
  // PII scrubbing
  // -----------------------------------------------------------------

  /** PII patterns restricted to syntax Java regex and RE2 (DuckDB) treat
    * identically — no lookarounds/backrefs, explicit classes. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val PhoneRe = "[0-9]{3}-[0-9]{4}"

  /** PII scrubbing (emails / IPv4s / phone-shaped numbers → typed mask
    * tokens) — the redaction pass a training pipeline runs before
    * tokenization. Map-only codegen'd `regexp_replace` chain; order
    * matters (emails first: their domains would otherwise half-match the
    * looser patterns). The synthetic corpus carries no PII, so the query
    * AUGMENTS each doc with deterministic doc_id-derived PII first and
    * both oracle sides scrub the same augmented text — what's verified is
    * the scrubber, not the augmentation. Output is the scrubbed text's
    * fingerprint plus per-kind redaction counts (counted pre-scrub). */
  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    val aug = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"), lit("@mail.example.com"),
      lit(" from 10."), pmod(col("doc_id"), lit(200L)).cast("string"),
      lit(".0."), pmod(col("doc_id"), lit(250L)).cast("string"),
      lit(" call 555-"), lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"))
    val scrubbed =
      regexp_replace(
        regexp_replace(
          regexp_replace(aug, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>")
    docs(s, dir).select(
      col("doc_id"),
      size(regexp_extract_all(aug, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(aug, lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(aug, lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
      md5(scrubbed).as("scrub_md5"),
      length(scrubbed).cast("long").as("scrub_len"))
  }

  val piiScrubSql: String = {
    val aug = "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'" +
      " || ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.' || CAST(doc_id % 250 AS VARCHAR)" +
      " || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    val scrub = s"regexp_replace(regexp_replace(regexp_replace($aug," +
      s" '$EmailRe', '<EMAIL>', 'g'), '$Ipv4Re', '<IP>', 'g'), '$PhoneRe', '<PHONE>', 'g')"
    s"""SELECT doc_id,
      |  CAST(len(regexp_extract_all($aug, '$EmailRe')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all($aug, '$Ipv4Re')) AS BIGINT) AS n_ips,
      |  CAST(len(regexp_extract_all($aug, '$PhoneRe')) AS BIGINT) AS n_phones,
      |  md5($scrub) AS scrub_md5,
      |  CAST(length($scrub) AS BIGINT) AS scrub_len
      |FROM documents""".stripMargin
  }

  // -----------------------------------------------------------------
  // Sequence packing
  // -----------------------------------------------------------------

  /** Deterministic sliding-window chunking — the retrieval-side twin of
    * [[seqPack]]: cut every document into token windows of `width` at
    * `stride` (overlap = width − stride), the layout RAG indexes and
    * long-context eval sets are built from. One chunk per window start
    * `1, 1+stride, 2·stride+1, …` while the start is in range; the last
    * chunk may be shorter (never padded, never dropped — every token is
    * covered exactly `ceil(width/stride)`-or-fewer times).
    *
    * Entirely integer/string arithmetic — no float anywhere, so the hash
    * gate is exact by construction. Map-only plan: `split` →
    * `posexplode(sequence(...))` → `slice`/`concat_ws`, all codegen'd
    * expressions (no HOF lambda, no UDF, no shuffle at any scale — chunk
    * rows land in the same task that read the document). */
  def chunkWindows(s: SparkSession, dir: String,
                   width: Int = 32, stride: Int = 24): DataFrame = {
    require(stride >= 1 && width >= stride, "need 1 <= stride <= width")
    docs(s, dir)
      .select(col("doc_id"), tokens.as("tk"))
      .select(col("doc_id"), col("tk"),
        posexplode(sequence(lit(1), size(col("tk")), lit(stride))))
      .select(col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        col("col").cast("long").as("start"),
        concat_ws(" ", slice(col("tk"), col("col"), lit(width))).as("chunk_text"),
        size(slice(col("tk"), col("col"), lit(width))).cast("long").as("n_tok"))
  }

  /** DuckDB twin of [[chunkWindows]]: zipped unnests over the same start
    * sequence (`range` is exclusive-stop where Spark's `sequence` is
    * inclusive — `range(1, n+1, stride)` yields the identical start set),
    * 1-based inclusive list slicing clamped with `least`. */
  def chunkWindowsSql(width: Int = 32, stride: Int = 24): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |st AS (
       |  SELECT doc_id, tk,
       |    unnest(range(1, len(tk) + 1, $stride)) AS start
       |  FROM t)
       |SELECT doc_id,
       |  CAST((start - 1) // $stride AS BIGINT) AS chunk_idx,
       |  CAST(start AS BIGINT) AS start,
       |  array_to_string(tk[CAST(start AS INT):CAST(least(start + ${width - 1}, len(tk)) AS INT)], ' ') AS chunk_text,
       |  CAST(len(tk[CAST(start AS INT):CAST(least(start + ${width - 1}, len(tk)) AS INT)]) AS BIGINT) AS n_tok
       |FROM st""".stripMargin

  /** Sequence packing for LLM pretraining: concatenate documents in a
    * deterministic order and cut fixed `budget`-token sequences — a doc's
    * pack is wherever its first token lands (the standard concat-and-chunk
    * pretraining layout). Sharded by `doc_id % nShards` so the running sum
    * is a PARTITIONED window: each shard packs independently in parallel.
    * The unpartitioned variant (one global running sum) is the classic
    * single-task straggler at 100 TB — shard count is the parallelism
    * dial, and pack ids are (shard, pack_id) pairs. */
  def seqPack(s: SparkSession, dir: String, budget: Int = 512, nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs(s, dir)
      .select(col("doc_id"), pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
              size(tokens).cast("long").as("n_tok"))
      .withColumn("tok_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tok"),
              // integral `div`, matching the oracle's `//` for ANY budget:
              // double division + cast can round a huge quotient up across
              // an integer boundary when budget isn't a power of two
              call_function("div", col("tok_before"), lit(budget.toLong)).as("pack_id"),
              pmod(col("tok_before"), lit(budget.toLong)).as("pack_offset"))
  }

  def seqPackSql(budget: Int = 512, nShards: Int = 8): String =
    s"""WITH t AS (
      |  SELECT doc_id, doc_id % $nShards AS shard,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, shard, n_tok,
      |    coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before
      |  FROM t)
      |SELECT doc_id, shard, n_tok,
      |  CAST(tok_before // $budget AS BIGINT) AS pack_id,
      |  CAST(tok_before % $budget AS BIGINT) AS pack_offset
      |FROM c""".stripMargin

  // -----------------------------------------------------------------
  // Token-length histogram
  // -----------------------------------------------------------------

  /** Token-count histogram (fixed-width buckets, top bucket open-ended) —
    * the sequence-length profile that sizes packing budgets and truncation
    * policy. One partial+final aggregation. */
  def tokenLengthHistogram(s: SparkSession, dir: String,
                           bucketWidth: Int = 16, maxBucket: Int = 31): DataFrame =
    docs(s, dir)
      .select(size(tokens).cast("long").as("n_tok"))
      .select(least(call_function("div", col("n_tok"), lit(bucketWidth.toLong)),
                    lit(maxBucket.toLong)).as("bucket"),
              col("n_tok"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"))

  def tokenLengthHistogramSql(bucketWidth: Int = 16, maxBucket: Int = 31): String =
    s"""WITH t AS (
      |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents)
      |SELECT least(n_tok // $bucketWidth, $maxBucket) AS bucket,
      |  count(*) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS total_tokens
      |FROM t GROUP BY 1""".stripMargin

  // -----------------------------------------------------------------
  // TF-IDF
  // -----------------------------------------------------------------

  /** Per-document top-k TF-IDF terms: tf from one (doc, tok) aggregation,
    * df from one (tok) aggregation joined back (broadcast — vocabularies
    * are small relative to corpora; at larger vocabularies this becomes a
    * shuffled join on tok), corpus size as a broadcast 1-row aggregate
    * (same no-unpartitioned-window discipline as [[unigramLogProb]]).
    * Deterministic tie-break (score desc, token asc).
    *
    * The ORACLED score is `tfidf_e4 = floor(tf·ln(N/df)·10⁴ + 0.5)` as a
    * BIGINT — `round(x, 4)` is not parity-safe (Spark rounds HALF_UP,
    * DuckDB half-even, and they disagree at representable midpoints),
    * while `floor(x + 0.5)` is the same operation in both engines and a
    * transcendental score never lands exactly on a .5 boundary (ln(1)=0,
    * the one exact case, floors identically). Ranking orders by the SAME
    * integer (then token), so rank ties can't flip on a last-ulp ln
    * divergence either. */
  def tfidfTopTerms(s: SparkSession, dir: String, topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs(s, dir).select(col("doc_id"), explode(tokens).as("tok"))
    val tf = tok.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs(s, dir).agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(broadcast(dfreq), Seq("tok")).crossJoin(broadcast(n))
      .withColumn("tfidf_e4",
        floor(col("tf") * log(col("n_docs") / col("df")) * lit(10000.0) + lit(0.5)).cast("long"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf_e4").desc, col("tok"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("doc_id"), col("tok"), col("tf"),
              col("tfidf_e4"), col("rnk").cast("long").as("rnk"))
  }

  def tfidfTopTermsSql(topK: Int = 5): String =
    s"""WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
      |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT t.doc_id, t.tok, t.tf,
      |    CAST(floor(t.tf * ln((SELECT count(*) FROM documents) * 1.0 / d.df) * 10000 + 0.5) AS BIGINT) AS tfidf_e4
      |  FROM tf t JOIN dfreq d USING (tok))
      |SELECT doc_id, tok, tf, tfidf_e4,
      |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf_e4 DESC, tok) AS BIGINT) AS rnk
      |FROM scored
      |QUALIFY rnk <= $topK""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_unigram_logprob" -> (unigramLogProb _),
    "q_text_repetition" -> (repetitionRatio _),
    "q_text_dup_ngrams" -> (dupNgramStats _),
    "q_text_outliers" -> (lengthOutliers _),
    "q_text_tokens" -> (tokenCounts _),
    "q_text_bpe_tokens" -> (bpeTokenCounts _),
    "q_text_winnow" -> ((s: SparkSession, d: String) => winnowFingerprints(s, d)),
    "q_text_quality" -> (qualityScore _),
    "q_text_langid" -> (languageId _),
    "q_text_langid_trigram" -> (languageIdTrigram _),
    "q_text_fingerprint" -> (fingerprint _),
    "q_text_corpus_stats" -> (corpusStats _),
    "q_text_vocab" -> ((s: SparkSession, d: String) => vocab(s, d)),
    "q_text_cms_freq" -> ((s: SparkSession, d: String) => tokenFreqCms(s, d)),
    "q_text_cms_freq_poly" -> ((s: SparkSession, d: String) => tokenFreqCmsPoly(s, d)),
    "q_text_pii_scrub" -> (piiScrub _),
    "q_text_seq_pack" -> ((s: SparkSession, d: String) => seqPack(s, d)),
    "q_text_chunks" -> ((s: SparkSession, d: String) => chunkWindows(s, d)),
    "q_text_len_hist" -> ((s: SparkSession, d: String) => tokenLengthHistogram(s, d)),
    "q_text_tfidf" -> ((s: SparkSession, d: String) => tfidfTopTerms(s, d)),
    "q_text_gopher_gates" -> (gopherGates _))

  val oracles: Map[String, String] = Map(
    "q_text_langid" -> languageIdSql,
    "q_text_winnow" -> winnowSql(),
    "q_text_unigram_logprob" -> unigramLogProbSql,
    "q_text_repetition" -> repetitionRatioSql,
    "q_text_dup_ngrams" -> dupNgramStatsSql,
    "q_text_outliers" -> lengthOutliersSql,
    "q_text_tokens" -> tokenCountsSql,
    "q_text_bpe_tokens" -> bpeTokenCountsSql,
    "q_text_quality" -> qualityScoreSql,
    "q_text_fingerprint" -> fingerprintSql,
    "q_text_corpus_stats" -> corpusStatsSql,
    "q_text_vocab" -> vocabSql,
    "q_text_cms_freq_poly" -> tokenFreqCmsPolySql(),
    "q_text_pii_scrub" -> piiScrubSql,
    "q_text_seq_pack" -> seqPackSql(),
    "q_text_chunks" -> chunkWindowsSql(),
    "q_text_len_hist" -> tokenLengthHistogramSql(),
    "q_text_tfidf" -> tfidfTopTermsSql(),
    "q_text_gopher_gates" -> gopherGatesSql)
}
