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
  final case class MediaFeatures(media_id: Long, feature: Array[Long])

  /** STUB — deterministic fake codec. A real implementation would wrap
    * libjpeg/ffmpeg here; the call sites and shapes would not change.
    *
    * The fake math is deliberately SQL-PORTABLE (payload length + a few
    * probed bytes, small-integer arithmetic — no wrapping fold hash, which
    * DuckDB's overflow-checked BIGINT multiply cannot express): the DuckDB
    * oracle recomputes every derived value, so the correctness gate
    * verifies the surrounding Spark plumbing (schema, mapPartitions batch
    * shape, binary handling) end-to-end rather than rows-only. */
  object FakeCodec {
    /** "Decode" a header: dims/duration derived from the length and the
      * first/middle/last payload bytes. */
    def probe(id: Long, kind: String, bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length
      def at(i: Int): Long = if (n == 0) 0L else (bytes(i) & 0xFF).toLong
      MediaMeta(id, kind, n.toLong,
        width = (16 + (n.toLong * 31 + at(0) * 7) % 1024).toInt,
        height = (16 + (n.toLong * 17 + at(n / 2) * 11) % 1024).toInt,
        duration_ms = (n.toLong * 1009 + at(math.max(n - 1, 0)) * 101) % 600000)
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

    /** "Extract" a fixed-dim feature vector (stand-in for an embedding):
      * dimension j accumulates the byte values at positions ≡ j mod
      * [[FeatureDim]]. Accumulation is in Long so the per-dim sums stay
      * EXACT for any payload size (a Float accumulator loses integer
      * exactness past 2²⁴ ≈ a 4 MB payload, silently diverging from the
      * integer-sum SQL oracle); a consumer that needs floats casts the
      * exact sums at the edge. */
    def features(id: Long, bytes: Array[Byte]): MediaFeatures = {
      val f = new Array[Long](FeatureDim)
      var i = 0
      while (i < bytes.length) {
        f(i % FeatureDim) += (bytes(i) & 0xFF)
        i += 1
      }
      MediaFeatures(id, f)
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
    // BIGINT casts: the oracle emits BIGINT, and int32-vs-int64 dtype skew
    // is a driver-hash failure even when values agree
    "q_mm_decode_meta" -> ((s: SparkSession, d: String) =>
      decodeMeta(s, d).toDF().select(
        col("media_id"), col("kind"), col("n_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("duration_ms"))),
    // posexplode to scalar (media_id, dim_idx, byte_sum) rows: the driver's
    // correctness gate sorts rows via pandas, which cannot canonicalize a
    // raw array column. Library callers use extractFeatures directly; the
    // sums are exact Long integers end-to-end.
    "q_mm_features" -> ((s: SparkSession, d: String) =>
      extractFeatures(s, d).toDF()
        .select(col("media_id"), posexplode(col("feature")))
        .select(col("media_id"), col("pos").cast("long").as("dim_idx"),
                col("col").as("byte_sum"))),
    "q_mm_frame_sample" -> ((s: SparkSession, d: String) =>
      sampleFrames(s, d)
        .groupBy("media_id", "kind", "total_bytes")
        .agg(count(lit(1)).as("n_frames"),
             sum(length(col("frame"))).as("sampled_bytes"))),
    // the multimodal near-dup tier (round-16): banded perceptual-hash
    // pairs, hash-gated against the brute-force oracle
    "q_mm_dedup_phash" -> ((s: SparkSession, d: String) => phashPairs(s, d)),
    // round-17 production tiers: exact-fingerprint collapse, the wide-key
    // C(6,3) banding at radius 3, and the persisted-index increment —
    // each hash-gated against the brute force over its population
    "q_mm_dedup_phash_collapsed" -> ((s: SparkSession, d: String) =>
      phashPairsCollapsed(s, d)),
    "q_mm_dedup_phash_wide" -> ((s: SparkSession, d: String) =>
      phashPairsWide(s, d)),
    "q_mm_dedup_phash_inc" -> (phashIncrementQuery _),
    // scalar projection (checksum, not the binary) for driver sortability
    "q_mm_resize" -> ((s: SparkSession, d: String) =>
      resizeMedia(s, d).select(
        col("media_id"), col("kind"),
        col("src_width").cast("long").as("src_width"),
        col("src_height").cast("long").as("src_height"),
        col("thumb_width").cast("long").as("thumb_width"),
        col("thumb_height").cast("long").as("thumb_height"),
        col("resized"),
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

  /** Shared oracle CTE: the media table synthesized from `documents`. The
    * corpus is ASCII (verified: zero docs where octet_length ≠ char
    * length), so DuckDB's char-indexed substr/ascii on the VARCHAR equals
    * byte indexing on the UTF-8 binary, and `ascii('')` = 0 matches the
    * codec's empty-payload guard. */
  private val mediaCte: String =
    """media AS (
      |  SELECT doc_id AS media_id,
      |    (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
      |    text AS content
      |  FROM documents)""".stripMargin

  /** DuckDB twins of the probe's width/height/duration math (`n` = payload
    * length; bytes probed at first / middle / last positions, 1-indexed). */
  private def widthSql(c: String) =
    s"16 + (length($c) * 31 + ascii(substr($c, 1, 1)) * 7) % 1024"
  private def heightSql(c: String) =
    s"16 + (length($c) * 17 + ascii(substr($c, length($c) // 2 + 1, 1)) * 11) % 1024"
  private def durationSql(c: String) =
    s"(length($c) * 1009 + ascii(substr($c, greatest(length($c), 1), 1)) * 101) % 600000"

  val decodeMetaSql: String =
    s"""WITH $mediaCte
      |SELECT media_id, kind,
      |  CAST(length(content) AS BIGINT) AS n_bytes,
      |  CAST(${widthSql("content")} AS BIGINT) AS width,
      |  CAST(${heightSql("content")} AS BIGINT) AS height,
      |  CAST(${durationSql("content")} AS BIGINT) AS duration_ms
      |FROM media""".stripMargin

  val featuresSql: String =
    s"""WITH $mediaCte,
      |d AS (SELECT media_id, content, unnest(range(0, $FeatureDim)) AS dim_idx FROM media)
      |SELECT media_id, CAST(dim_idx AS BIGINT) AS dim_idx,
      |  CAST(coalesce(list_sum(list_transform(
      |    range(dim_idx + 1, CAST(length(content) + 1 AS BIGINT), $FeatureDim),
      |    i -> ascii(substr(content, CAST(i AS INT), 1)))), 0) AS BIGINT) AS byte_sum
      |FROM d""".stripMargin

  /** Resize oracle: budget = 64·64/8 = 512 bytes; the stride-sampled thumb
    * is rebuilt char-by-char (positions `(i·n)//512`, 0-indexed) and
    * md5-checksummed like the Spark side. */
  val resizeSql: String =
    s"""WITH $mediaCte,
      |m AS (
      |  SELECT media_id, kind, content, length(content) AS n,
      |    ${widthSql("content")} AS w, ${heightSql("content")} AS h
      |  FROM media),
      |t AS (
      |  SELECT media_id, kind, n, w, h,
      |    CASE WHEN n <= 512 THEN content
      |         ELSE list_aggregate(list_transform(range(0, 512),
      |                i -> substr(content, CAST((i * n) // 512 + 1 AS INT), 1)),
      |              'string_agg', '') END AS thumb
      |  FROM m)
      |SELECT media_id, kind,
      |  CAST(w AS BIGINT) AS src_width, CAST(h AS BIGINT) AS src_height,
      |  CAST(CASE WHEN n <= 512 THEN w ELSE 64 END AS BIGINT) AS thumb_width,
      |  CAST(CASE WHEN n <= 512 THEN h ELSE 64 END AS BIGINT) AS thumb_height,
      |  n > 512 AS resized,
      |  CAST(length(thumb) AS BIGINT) AS thumb_bytes,
      |  md5(thumb) AS thumb_md5
      |FROM t""".stripMargin

  // -----------------------------------------------------------------
  // Perceptual-hash near-dup (round-16 verdict task 7): the multimodal ×
  // dedup family intersection
  // -----------------------------------------------------------------

  /** aHash-family 64-bit perceptual fingerprint over the codec's OWN
    * pixel path (the average-hash member of the pHash family — the
    * classic near-dup image fingerprint): "decode+resize" to a 64-pixel
    * thumb via [[FakeCodec.resize]] (budget 16·32/8 = 64 — a real codec
    * would produce the same 64 grayscale pixels from an 8×8 scale-down),
    * then bit i = [pixels·p_i ≥ Σp] — the ≥-mean rule in exact integer
    * arithmetic, so the DuckDB oracle recomputes it bit-for-bit. Bit 63
    * is structurally 0 (the [[graft.operators.Dedup.simhashPairsSql]]
    * convention: DuckDB's checked BIGINT shift cannot build `1 << 63`),
    * leaving 63 usable bits; a sub-64-byte payload passes through resize
    * unresized and fingerprints over its own length (`m`). */
  def phashOf(bytes: Array[Byte]): Long = {
    val thumb = FakeCodec.resize(bytes, 16, 32)
    val m = thumb.length // = min(n, 64) by the resize budget
    var sum = 0L
    var i = 0
    while (i < m) { sum += (thumb(i) & 0xFF); i += 1 }
    var fp = 0L
    val bits = math.min(m, 63)
    i = 0
    while (i < bits) {
      if (m.toLong * (thumb(i) & 0xFF) >= sum) fp |= (1L << i)
      i += 1
    }
    fp
  }

  /** `(doc_id, simhash)` perceptual fingerprints of the media table — the
    * COLUMN NAMES are the banding contract of
    * [[graft.operators.Dedup.simhashPairsFrom]], which [[phashPairs]]
    * reuses verbatim (pigeonhole recall is fingerprint-agnostic). Map-only
    * typed map, per-partition codec state like every decode pass. */
  private[graft] def phashFingerprints(s: SparkSession, dir: String): DataFrame =
    phashFingerprintsOf(s, mediaTable(s, dir))

  /** Fingerprints of a CALLER-SUPPLIED media frame `(media_id, content)`
    * — the per-batch half the persisted-index increment fingerprints
    * with (only the batch is ever decoded; stored media is represented
    * by its 8-byte fingerprint). */
  private[graft] def phashFingerprintsOf(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    // spreadForCompute: the decode+hash map and the banded joins built on
    // it were single-task on the narrow bench scan (Dedup.spreadForCompute
    // rationale — no-op at deployment partition counts)
    graft.operators.Dedup.spreadForCompute(
        media.select(col("media_id"), col("content")))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, phashOf(bytes)) })
      .toDF("doc_id", "simhash")
  }

  /** Perceptual near-dup pairs at Hamming ≤ `maxHamming` over the media
    * corpus: the SimHash 8×8-band pipeline applied to [[phashOf]]
    * fingerprints — banded candidates (exact recall by pigeonhole for
    * maxHamming ≤ 7), `bit_count(xor)` verify, never all-pairs. The
    * brute-force DuckDB twin ([[phashPairsSql]]) hash-gates the whole
    * path: codec pixel math → fingerprint → banding → verify. */
  def phashPairs(s: SparkSession, dir: String, maxHamming: Int = PhashMaxHamming): DataFrame =
    // eager checkpoint, not .cache() (r17): four concurrent consumers of
    // the fingerprint table (banded x/y + both verify sides) raced a lazy
    // cache and re-ran the image DECODE + hash per branch — the costliest
    // map in the family (the minhashLshPairs double-compute class)
    graft.operators.Dedup
      .simhashPairsFrom(graft.Checkpoints.local(
        phashFingerprints(s, dir)), maxHamming)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"))

  /** Near-dup radius for the registered tier: tight enough that a pair
    * needs 56+ of 63 bits agreeing (true perceptual twins), wide enough
    * that the gate corpus's planted near-dup texts collide. */
  val PhashMaxHamming = 7

  /** The production wide-key tier's radius (round-16 verdict task 2):
    * ≤ 3 flipped bits of 63 — the C(6,3)=20-table Manku corner, where
    * band keys span ~2^32 values instead of the narrow tier's 256 and a
    * hot bucket MEANS a near-dup cluster (the [[graft.operators.Dedup
    * .HotBucketCap]] precondition), not 1/256th of the corpus. */
  val PhashWideMaxHamming = 3

  // -----------------------------------------------------------------
  // Production-scale perceptual near-dup tiers (round-16 verdict task 2):
  // the narrow 8×8 banding above is pigeonhole-exact but its per-band
  // bucket population is structurally n/256 — corpus-quadratic at scale
  // (the round-7 "weak by design" shape on text). These are the same two
  // escapes the text family ships, applied to the perceptual fingerprint:
  // exact-fingerprint collapse (identical thumbs are the dominant mass in
  // real image corpora) and the wide-key C(6,3) tier at its exact radius.
  // -----------------------------------------------------------------

  /** §8.5.1 composition discipline on the perceptual family, REGISTERED
    * (`q_mm_dedup_phash_collapsed`): collapse exact-fingerprint
    * duplicates to their min-id representative FIRST (identical thumbs —
    * an exact, deterministic groupBy on the 8-byte fingerprint), then run
    * the identical narrow banded pipeline over the survivors. The narrow
    * tier's quadratic term is Σ cluster² over identical-fingerprint
    * groups, which exact duplication dominates; collapsing removes that
    * mass while changing no near-dup semantics among representatives, so
    * the oracle is the same brute-force scan restricted to
    * `min(media_id) per phash`. */
  def phashPairsCollapsed(s: SparkSession, dir: String,
                          maxHamming: Int = PhashMaxHamming): DataFrame = {
    val fps = phashFingerprints(s, dir)
    // spreadForCompute BEFORE the checkpoint (r18): AQE coalesces the
    // tiny collapse aggregation to ONE partition, and the banded
    // self-join + verify inherit that width through the checkpoint —
    // profiled as a single 2.6 s task emitting the full 21.8 MB pair
    // shuffle while 31 cores idled
    val reps = graft.Checkpoints.local(
      graft.operators.Dedup.spreadForCompute(
        fps.groupBy(col("simhash"))
          .agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"), col("simhash"))))
    graft.operators.Dedup.simhashPairsFrom(reps, maxHamming)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"))
  }

  /** PRODUCTION perceptual near-dup tier, REGISTERED
    * (`q_mm_dedup_phash_wide`): the Manku wide-key banding
    * ([[graft.operators.Dedup.simhashPairsWideFrom]] — the contract is
    * fingerprint-agnostic) at radius ≤ [[PhashWideMaxHamming]], with the
    * observable hot-bucket cap. Pigeonhole recall stays exact at the
    * reduced radius; bucket population drops from n/256 to chance
    * (~n/2^32) plus genuine near-identical clusters — the shape that
    * survives a 100 TB image corpus. */
  def phashPairsWide(s: SparkSession, dir: String,
                     maxHamming: Int = PhashWideMaxHamming,
                     nBlocks: Int = 6,
                     bucketCap: Int = graft.operators.Dedup.HotBucketCap): DataFrame =
    graft.operators.Dedup
      .simhashPairsWideFrom(graft.Checkpoints.local(
        phashFingerprints(s, dir)), maxHamming, nBlocks, bucketCap)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"))

  /** Persist the perceptual near-dup index — the
    * [[graft.operators.Dedup.buildSimhashIndex]] machinery (layout,
    * sidecars, meta handshake) over [[phashOf]] fingerprints: stored
    * media is represented by 8 bytes per item, and an ingest batch is
    * decoded exactly once. */
  def buildPhashIndex(s: SparkSession, media: DataFrame, indexDir: String,
                      maxHamming: Int = PhashWideMaxHamming,
                      nBlocks: Int = 6): Unit =
    graft.operators.Dedup.buildFingerprintIndex(s,
      phashFingerprintsOf(s, media), indexDir, maxHamming, nBlocks)

  /** Dedup a NEW media batch against a [[buildPhashIndex]] persisted
    * index — the daily-ingest shape on the perceptual family: decode +
    * fingerprint ONLY the batch, probe the stored wide-key postings,
    * verify `bit_count(xor) ≤ maxHamming` on the 8-byte fingerprints,
    * append when asked. Cost ∝ batch + touched postings, never ∝ the
    * stored corpus. */
  def phashDedupIncrement(s: SparkSession, newMedia: DataFrame, indexDir: String,
                          maxHamming: Int = PhashWideMaxHamming,
                          nBlocks: Int = 6,
                          bucketCap: Int = graft.operators.Dedup.HotBucketCap,
                          append: Boolean = true,
                          strictIds: Boolean = true): DataFrame =
    graft.operators.Dedup.fingerprintDedupIncrement(s,
      phashFingerprintsOf(s, newMedia), indexDir, maxHamming, nBlocks,
      bucketCap, append, strictIds, "phashDedupIncrement")
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"))

  /** Per-JVM scratch + memo for the registered increment
    * (`q_mm_dedup_phash_inc`) — the
    * [[graft.operators.Dedup.simhashIncrementQuery]] convention: base
    * index over the proportional bottom-4/5 media split, built on first
    * use; `append = false` keeps repeat runs pure. */
  private lazy val phashIndexScratch: java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft-phidx-")
  private val builtPhashIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def phashIncrementQuery(s: SparkSession, dir: String): DataFrame = {
    val split = graft.operators.Dedup.incrementSplitAt(s, dir)
    val had = builtPhashIndexes.containsKey(dir)
    val idx = builtPhashIndexes.computeIfAbsent(dir, _ => {
      val p = phashIndexScratch.resolve(java.lang.Integer.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(dir))).toString
      buildPhashIndex(s, mediaTable(s, dir).filter(col("media_id") < split), p)
      p
    })
    println(s"[graft] q_mm_dedup_phash_inc: index " +
      s"${if (had) "cache-hit" else "built-on-first-use"} at $idx")
    phashDedupIncrement(s,
      mediaTable(s, dir).filter(col("media_id") >= split), idx, append = false)
  }

  /** DuckDB twin of the perceptual-hash tiers: recompute the thumb pixels
    * (`(i·n)//64` stride positions — the resize oracle's arithmetic at
    * budget 64), the ≥-mean bits, and brute-force ALL pairs at the
    * radius. Brute force is the right oracle shape for a pigeonhole-exact
    * banding (the [[graft.operators.Dedup.simhashPairsSql]] argument):
    * narrow, collapsed, wide, and increment tiers all must EQUAL the
    * all-pairs scan over their respective population.
    *  - `collapsed`: restrict both sides to `min(media_id) per phash`
    *    (exact-fingerprint representatives — mirrors
    *    [[phashPairsCollapsed]]'s groupBy exactly);
    *  - `incrementOnly`: restrict to pairs touching the top-1/5 media
    *    split (the [[graft.operators.Dedup.incrementSplitSql]]
    *    convention — media ids ARE doc ids). */
  def phashPairsSql(maxHamming: Int = PhashMaxHamming,
                    collapsed: Boolean = false,
                    incrementOnly: Boolean = false): String = {
    val fpr =
      if (collapsed)
        """fpr AS (
          |  SELECT fp.media_id, fp.phash FROM fp
          |  JOIN (SELECT min(media_id) AS media_id FROM fp GROUP BY phash) k
          |    USING (media_id))""".stripMargin
      else "fpr AS (SELECT media_id, phash FROM fp)"
    val splitPred =
      if (incrementOnly)
        s"\n  AND (a.media_id >= ${graft.operators.Dedup.incrementSplitSql}" +
          s" OR b.media_id >= ${graft.operators.Dedup.incrementSplitSql})"
      else ""
    s"""WITH $mediaCte,
      |px AS (
      |  SELECT media_id, length(content) AS n, content,
      |    unnest(range(0, least(length(content), 64))) AS i
      |  FROM media),
      |pv AS (
      |  SELECT media_id, i,
      |    CASE WHEN n <= 64 THEN n ELSE 64 END AS m,
      |    ascii(substr(content,
      |      CAST(CASE WHEN n <= 64 THEN i ELSE (i * n) // 64 END AS INT) + 1,
      |      1))::BIGINT AS p
      |  FROM px),
      |fp AS (
      |  SELECT d.media_id,
      |    coalesce(sum(CASE WHEN v.i < least(v.m, 63) AND v.m * v.p >= t.s
      |                      THEN (1::BIGINT << CAST(v.i AS INT)) ELSE 0 END),
      |             0) AS phash
      |  FROM media d
      |  LEFT JOIN pv v USING (media_id)
      |  LEFT JOIN (SELECT media_id, sum(p) AS s FROM pv GROUP BY 1) t
      |    USING (media_id)
      |  GROUP BY 1),
      |$fpr
      |SELECT a.media_id AS media_a, b.media_id AS media_b,
      |  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
      |FROM fpr a JOIN fpr b ON a.media_id < b.media_id
      |WHERE bit_count(xor(a.phash, b.phash)) <= $maxHamming$splitPred""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_mm_decode_meta" -> decodeMetaSql,
    "q_mm_features" -> featuresSql,
    "q_mm_resize" -> resizeSql,
    "q_mm_frame_sample" -> frameSampleSql,
    "q_mm_dedup_phash" -> phashPairsSql(),
    "q_mm_dedup_phash_collapsed" -> phashPairsSql(collapsed = true),
    "q_mm_dedup_phash_wide" -> phashPairsSql(PhashWideMaxHamming),
    "q_mm_dedup_phash_inc" -> phashPairsSql(PhashWideMaxHamming,
      incrementOnly = true))
}
