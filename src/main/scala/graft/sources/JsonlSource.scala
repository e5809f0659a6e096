package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.CardinalityStream

/** Batch + streaming readers for the reference's JSONL wire format — the
  * documented ingestion path is `stream.jsonl` replayed through a console
  * producer (`/root/reference/README.md:27,36`); these read the same lines
  * directly.
  *
  * Malformed lines are dropped (log-and-skip parity, `kafkaio.go:78-81`):
  * the text is read as raw lines and pushed through the same
  * `CardinalityStream.parse` used by the Kafka path, so batch, file-stream
  * and Kafka ingestion share one parser.
  */
object JsonlSource {

  /** Batch read: one `(uid, event_time)` row per valid line. */
  def read(spark: SparkSession, path: String): DataFrame =
    CardinalityStream.parse(
      spark.read.text(path).select(col("value")))

  /** Streaming read of a directory of JSONL files — the no-broker replay
    * path (new files are picked up per micro-batch). */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    CardinalityStream.parse(
      spark.readStream
        .schema("value STRING")
        .text(dir)
        .select(col("value")))

  /** Write a stats DataFrame (`Type`,`Timestamp`,`Value`) as JSONL with the
    * reference's capitalized keys — the file twin of the Kafka sink. */
  def writeStats(stats: DataFrame, path: String): Unit =
    CardinalityStream.toSinkFormat(stats)
      .write.mode("overwrite").text(path)
}
