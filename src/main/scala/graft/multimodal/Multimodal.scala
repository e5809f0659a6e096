package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators.
  *
  * The environment has no media codecs, so the DECODE step is a
  * clearly-marked deterministic fake ([[FakeCodec]]) — everything around it
  * (schema, binary column handling, partition-wise batch processing via
  * `mapPartitions`, fixed-dimension feature vectors, frame sampling with
  * `substring` on binary + posexplode) is the real Spark plumbing a
  * production decoder would drop into.
  *
  * Scale notes: media payloads dominate row size — operators here never
  * shuffle the binary column (features/metadata are projected out first;
  * frame sampling explodes AFTER slicing, so each output row carries only
  * its frame). `mapPartitions` keeps per-partition decoder state (a real
  * codec context is expensive to open) — the Scala analogue of a Pandas
  * `mapInPandas` batch UDF.
  */
object Multimodal {

  val FrameLen = 32 // bytes per sampled "frame"
  val FeatureDim = 8

  final case class MediaMeta(media_id: Long, kind: String, n_bytes: Long,
                             width: Int, height: Int, duration_ms: Long)
  final case class MediaFeatures(media_id: Long, feature: Array[Float])

  /** STUB — deterministic fake codec. A real implementation would wrap
    * libjpeg/ffmpeg here; the call sites and shapes would not change. */
  object FakeCodec {
    /** "Decode" a header: all values derived deterministically from bytes. */
    def probe(id: Long, kind: String, bytes: Array[Byte]): MediaMeta = {
      val h = bytes.foldLeft(1125899906842597L)((acc, b) => 31 * acc + b)
      MediaMeta(id, kind, bytes.length.toLong,
        width = 16 + (math.abs(h) % 1024).toInt,
        height = 16 + (math.abs(h >> 10) % 1024).toInt,
        duration_ms = math.abs(h >> 20) % 600000)
    }

    /** "Resize" to a target pixel budget: deterministic stride-sampling of
      * the payload down to `targetW*targetH/8` bytes (a real codec would
      * decode, scale, re-encode here — same signature, same batch shape). */
    def resize(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
      val budget = math.max(1, targetW * targetH / 8)
      if (bytes.length <= budget) bytes
      else {
        val out = new Array[Byte](budget)
        var i = 0
        while (i < budget) {
          out(i) = bytes((i.toLong * bytes.length / budget).toInt)
          i += 1
        }
        out
      }
    }

    /** "Extract" a fixed-dim feature vector (stand-in for an embedding). */
    def features(id: Long, bytes: Array[Byte]): MediaFeatures = {
      val f = new Array[Float](FeatureDim)
      var i = 0
      while (i < bytes.length) {
        f(i % FeatureDim) += bytes(i) / 128.0f
        i += 1
      }
      MediaFeatures(id, f.map(x => x / math.max(1, bytes.length / FeatureDim)))
    }
  }

  /** Synthesize a media table from `documents` (text bytes stand in for an
    * encoded payload): `(media_id, kind, content: binary)`. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"))

  /** Decode metadata partition-wise (per-partition codec state). */
  def decodeMeta(s: SparkSession, dir: String): Dataset[MediaMeta] = {
    import s.implicits._
    mediaTable(s, dir).select("media_id", "kind", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // real codec: open once per partition, reuse across rows
        it.map { case (id, kind, bytes) => FakeCodec.probe(id, kind, bytes) }
      }
  }

  /** Feature extraction → fixed-dim float vectors, ready for the
    * [[graft.operators.Similarity]] ANN operators. */
  def extractFeatures(s: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import s.implicits._
    mediaTable(s, dir).select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => FakeCodec.features(id, bytes) })
  }

  /** Resize/thumbnail pass: decode header + downsample each payload to a
    * target pixel budget, partition-wise (per-partition codec state, like
    * [[decodeMeta]]). The thumbnail binary stays with its row — never
    * shuffled (the query projection reduces it to a checksum before any
    * exchange).
    *
    * `thumb_width`/`thumb_height` describe the ACTUAL thumb payload: when
    * the source already fits the pixel budget the codec passes it through
    * unresized, and the row reports the source dims with
    * `resized = false` — not the requested target dims, which would
    * misdescribe the bytes. */
  def resizeMedia(s: SparkSession, dir: String,
                  targetW: Int = 64, targetH: Int = 64): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).select("media_id", "kind", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, bytes) =>
          val meta = FakeCodec.probe(id, kind, bytes)
          val thumb = FakeCodec.resize(bytes, targetW, targetH)
          val resized = !(thumb eq bytes)
          val (tw, th) = if (resized) (targetW, targetH) else (meta.width, meta.height)
          (id, kind, meta.width, meta.height, tw, th, resized, thumb)
        }
      }
      .toDF("media_id", "kind", "src_width", "src_height",
            "thumb_width", "thumb_height", "resized", "thumb")
  }

  /** Frame sampling: slice the binary payload into fixed-length frames
    * (every `stride`-th), one output row per frame. Pure SQL — `substring`
    * works on BinaryType and stays codegen'd; explode happens after
    * slicing so shuffled rows carry only their 32-byte frame. */
  def sampleFrames(s: SparkSession, dir: String, stride: Int = 4): DataFrame = {
    val nFrames = greatest(lit(1), (length(col("content")) / lit(FrameLen * stride)).cast("int"))
    mediaTable(s, dir)
      .withColumn("frame_idx", explode(sequence(lit(0), nFrames - 1)))
      .select(
        col("media_id"), col("kind"), col("frame_idx").cast("long").as("frame_idx"),
        col("content").substr(col("frame_idx") * (FrameLen * stride) + 1, lit(FrameLen)).as("frame"),
        length(col("content")).cast("long").as("total_bytes"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_decode_meta" -> ((s: SparkSession, d: String) => decodeMeta(s, d).toDF()),
    // posexplode to scalar (media_id, dim_idx, value) rows: the driver's
    // correctness gate sorts rows via pandas, which cannot canonicalize a
    // raw array<float> column. Library callers use extractFeatures directly.
    "q_mm_features" -> ((s: SparkSession, d: String) =>
      extractFeatures(s, d).toDF()
        .select(col("media_id"), posexplode(col("feature")))
        .select(col("media_id"), col("pos").cast("long").as("dim_idx"),
                round(col("col").cast("double"), 5).as("value"))),
    "q_mm_frame_sample" -> ((s: SparkSession, d: String) =>
      sampleFrames(s, d)
        .groupBy("media_id", "kind", "total_bytes")
        .agg(count(lit(1)).as("n_frames"),
             sum(length(col("frame"))).as("sampled_bytes"))),
    // scalar projection (checksum, not the binary) for driver sortability
    "q_mm_resize" -> ((s: SparkSession, d: String) =>
      resizeMedia(s, d).select(
        col("media_id"), col("kind"), col("src_width"), col("src_height"),
        col("thumb_width"), col("thumb_height"), col("resized"),
        length(col("thumb")).cast("long").as("thumb_bytes"),
        md5(col("thumb")).as("thumb_md5"))))

  /** DuckDB twin of `q_mm_frame_sample` — the slicing arithmetic is pure
    * SQL (no codec), so it IS oracle-able. The corpus is ASCII (verified:
    * zero docs where octet_length ≠ char length), so DuckDB's char-indexed
    * substr/length on the VARCHAR equals Spark's byte-indexed substr on
    * the UTF-8 binary. Stride = FrameLen × 4 = 128. */
  val frameSampleSql: String =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |    (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
      |    text AS content
      |  FROM documents),
      |f AS (
      |  SELECT media_id, kind, CAST(length(content) AS BIGINT) AS total_bytes,
      |    unnest(range(0, greatest(length(content) // 128, 1))) AS frame_idx, content
      |  FROM media)
      |SELECT media_id, kind, total_bytes,
      |  count(*) AS n_frames,
      |  CAST(sum(length(substr(content, CAST(frame_idx * 128 + 1 AS INT), 32))) AS BIGINT) AS sampled_bytes
      |FROM f GROUP BY 1, 2, 3""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_mm_frame_sample" -> frameSampleSql)
}
