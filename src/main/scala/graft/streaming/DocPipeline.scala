package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Ingest-time streaming document pipeline — the batch quality/dedup
  * operators composed on an unbounded document stream, the "clean the
  * crawl as it lands" path of a training-data pipeline:
  *
  *  1. enrich: token count + quality score ([[TextAnalysis.qualityCol]],
  *     the same expression the batch query oracles) — map-only, stateless;
  *  2. gate: drop documents below `minQuality`;
  *  3. fingerprint: canonical-form md5 ([[TextAnalysis.fpMd5]]) — the key
  *     shared with every batch dedup operator, so stream- and batch-kept
  *     sets compose;
  *  4. in-stream dedup: `dropDuplicatesWithinWatermark` on the
  *     fingerprint — state bounded by keys per watermark horizon
  *     ([[StreamDedup.withinWatermark]]);
  *  5. corpus dedup: stream–static left-anti join against the existing
  *     corpus fingerprint index — zero stream state
  *     ([[StreamDedup.againstCorpus]]).
  *
  * Scale shape: stages 1–3 and 5 are stateless per micro-batch (the
  * static index broadcasts when small, bloom-prefilters when not — see
  * [[graft.operators.Dedup.crossCorpusNewDocs]]); only stage 4 holds
  * state, one row per distinct fingerprint inside the horizon. The text
  * column rides through projection-only stages and is never shuffled
  * except by the dedup's key exchange.
  *
  * Input schema: `(doc_id, text, event_time)`; output adds
  * `(n_tokens, quality, fp_md5)` for the surviving documents.
  */
object DocPipeline {

  def apply(docs: DataFrame, corpusFps: DataFrame,
            minQuality: Double = 0.2,
            watermark: String = "10 minutes"): DataFrame = {
    val scored = docs
      .withColumn("n_tokens",
        size(regexp_extract_all(col("text"),
          lit(TextAnalysis.NonWsClass + "+"), lit(0))).cast("long"))
      .withColumn("quality", round(TextAnalysis.qualityCol(col("text")), 4))
      .withColumn("fp_md5", TextAnalysis.fpMd5(col("text")))
    // gate on the RAW score — the rounded column is display/export only
    // (rounding would admit docs up to 5e-5 below the threshold)
    val kept = scored.filter(TextAnalysis.qualityCol(col("text")) >= minQuality)
    val inStreamDeduped =
      StreamDedup.withinWatermark(kept, watermark, keys = Seq("fp_md5"))
    StreamDedup.againstCorpus(inStreamDeduped, corpusFps)
  }
}
