package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Structured-Streaming rebuild of the reference pipeline (SURVEY.md §2):
  * Kafka source → JSON parse (drop-malformed) → 5-granularity event-time
  * windowed distinct-count → `{Type,Timestamp,Value}` JSON → Kafka sink.
  *
  * Differences from the reference, by design (SURVEY.md §7.4):
  *  - windows are calendar-aligned (the exact data-driven tier is
  *    [[DataDrivenWindows]]);
  *  - watermarking bounds state and handles late data (the reference has
  *    none — late events silently join the current window);
  *  - checkpointing gives at-least-once (reference: at-most-once).
  *
  * Scale: each granularity is an independent windowed `approx_count_distinct`
  * over the same source — state per key is one fixed-size HLL++ register
  * set, so a 1000-executor cluster holds (buckets × 16 KiB) state per
  * granularity regardless of user cardinality.
  */
object CardinalityStream {

  /** Schema of the reference's input JSON (`processor.go:13-16`). */
  val userSchema: StructType = StructType(Seq(
    StructField("uid", StringType),
    StructField("ts", LongType)))

  /** Parse raw JSON message values into (uid, event_time), dropping
    * malformed rows — the analogue of the reference's log-and-skip
    * (`kafkaio.go:78-81`). Also drops `ts <= 0` rows, which the reference
    * would mishandle via u64 underflow (SURVEY.md §2.1.3).
    *
    * `referenceParity = true` replicates jsoniter's default decode
    * (`processor.go:87` via `kafkaio.go:77`), closing ALL previously
    * documented decode divergences:
    *  - missing/null `uid` decodes as `""` and IS counted as a distinct
    *    user instead of being dropped;
    *  - JSON keys match case-insensitively with Go's sequential-overwrite
    *    semantics: fields are processed in document order, every
    *    case-insensitive match overwrites the struct field, and a JSON
    *    null assignment is a no-op — so the decoded value is the LAST
    *    non-null case-insensitive match (`{"UID":…}` fills uid;
    *    `{"uid":"a","UID":"b"}` decodes `"b"`; `{"uid":"a","uid":null}`
    *    keeps `"a"`). The parity path parses into `map<string,string>` and
    *    resolves fields over `map_entries` (which preserves document order
    *    and keeps duplicate keys), NOT by lowering the map keys — a
    *    lowered map hits Spark's DUPLICATED_MAP_KEY error on
    *    case-colliding keys and one poison message would kill the
    *    streaming query;
    *  - a NON-STRING uid value (`{"uid":123,…}`, booleans, objects,
    *    arrays) drops the whole message — jsoniter raises a type error
    *    where Jackson would coerce `123` → `"123"` and count it. Detection
    *    reads the first character of the raw uid value (JSON values can
    *    only open with `"` string / `n` null / digit / `-` / `t` / `f` /
    *    `{` / `[`; only string/null/absent survive jsoniter);
    *  - a STRING or float `ts` (`{"ts":"123"}`, `{"ts":1.5}`) likewise
    *    drops: the raw ts value must open with a digit (Go uint64 also
    *    rejects `-`), and fractional/exponent forms fail the string→long
    *    cast → null → dropped, matching Go's strict-integer error path.
    * Residual edges, documented not replicated: the uid/ts TYPE guards
    * read only the FIRST occurrence of each key in the raw text, so a
    * duplicate key whose SECOND occurrence is type-invalid
    * (`{"uid":"a","UID":123}` — jsoniter errors and drops) is kept here;
    * `"uid"`/`"ts"` appearing verbatim inside an EARLIER field's
    * string value misreads the first-char guard; and a `ts` in
    * (2⁶³, 2⁶⁴) — decodable by Go's uint64 — overflows the signed long
    * (`try_cast` nulls it) and drops here where the reference counts it.
    * None occurs in the reference's `{uid,ts}` wire shape / realistic
    * epoch timestamps.
    *
    * Rows dropped on any path are counted via `Dataset.observe` under the
    * observation name `graft_parse` (`n_in`, `n_bad_uid`, `n_malformed`,
    * `n_nonpos_ts`) — the "drop them with a metric" discipline of
    * SURVEY.md §7.4; surfaced per micro-batch through
    * `QueryProgressEvent.progress.observedMetrics` (asserted in
    * StreamingSpec). */
  def parse(raw: DataFrame, referenceParity: Boolean = false): DataFrame = {
    val ws = "[ \\t\\r\\n]*"
    // LAST non-null case-insensitive match, in document order — Go's
    // decoder processes fields sequentially, each case-insensitive match
    // overwrites, and null assignments are no-ops. `map_entries` preserves
    // parse order and keeps duplicate keys (the parsed map is NOT deduped
    // internally; element_at would return the FIRST duplicate). `get`
    // instead of element_at(-1): ANSI mode errors on indexing an empty
    // array, `get` returns null.
    def ciField(name: String): Column = {
      val matches = filter(map_entries(col("m")),
        e => lower(e.getField("key")) === lit(name) && e.getField("value").isNotNull)
      get(matches, size(matches) - 1).getField("value")
    }
    val parsed =
      if (referenceParity)
        raw.select(col("value").cast("string").as("raw"))
          .select(col("raw"),
            from_json(col("raw"),
              org.apache.spark.sql.types.MapType(StringType, StringType)).as("m"))
          .select(col("raw"),
            ciField("uid").as("uid"),
            // try_cast, not cast: ANSI mode errors the whole batch on
            // "1.5"/"15e2"; jsoniter just drops that one message
            ciField("ts").try_cast("long").as("ts"),
            col("m").isNotNull.as("json_ok"))
      else
        raw.select(col("value").cast("string").as("raw"))
          .select(col("raw"), from_json(col("raw"), userSchema).as("m"))
          .select(col("raw"), col("m.uid").as("uid"), col("m.ts").as("ts"),
                  lit(true).as("json_ok"))
    val uidOk =
      if (referenceParity)
        regexp_extract(col("raw"), s""""[uU][iI][dD]"$ws:$ws(.)""", 1).isin("", "\"", "n")
      else col("uid").isNotNull
    val tsOk =
      if (referenceParity)
        // Go decodes ts as uint64: the raw value must be a bare integer
        // (opens with a digit; the long cast above nulls fractions/exponents)
        regexp_extract(col("raw"), s""""[tT][sS]"$ws:$ws(.)""", 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7", "8", "9")
      else lit(true)
    val flagged = parsed
      .withColumn("ok_uid", uidOk)
      .withColumn("malformed", col("ts").isNull || !col("json_ok") || !tsOk)
      .withColumn("nonpos_ts", col("ts").isNotNull && col("ts") <= 0)
      .observe("graft_parse",
        count(lit(1)).as("n_in"),
        count_if(!col("ok_uid")).as("n_bad_uid"),
        count_if(col("malformed")).as("n_malformed"),
        count_if(col("nonpos_ts")).as("n_nonpos_ts"))
    flagged
      .filter(col("ok_uid") && !col("malformed") && !col("nonpos_ts"))
      .select(
        (if (referenceParity) coalesce(col("uid"), lit("")) else col("uid")).as("uid"),
        timestamp_seconds(col("ts")).as("event_time"))
  }

  /** One granularity's windowed approximate distinct count.
    * minute/day/week use fixed-width tumbling `window()` — grouped by the
    * WINDOW COLUMN itself, not a projection of it: extracting `.start`
    * before the groupBy severs the watermark→aggregation linkage and
    * append mode rejects the query (STREAMING_OUTPUT_MODE). Month/year are
    * calendar-true via `date_trunc` (window() cannot express them); they
    * keep the watermark column association only in update/complete modes.
    */
  def aggregated(parsed: DataFrame, granularity: String, watermark: String = "10 minutes"): DataFrame = {
    val wm = parsed.withWatermark("event_time", watermark)
    val agg = approx_count_distinct(col("uid"), graft.core.Cardinality.ReferenceRsd).as("Value")
    val aggregated = granularity match {
      case "minute" | "day" =>
        val dur = Map("minute" -> "1 minute", "day" -> "1 day")(granularity)
        wm.groupBy(window(col("event_time"), dur).as("win")).agg(agg)
          .withColumn("win_start", col("win.start"))
      case "week" =>
        // epoch-aligned 7-day windows would start on Thursdays (1970-01-01);
        // startTime shifts the origin 4 days to Monday so streaming weeks
        // match the batch tier's ISO date_trunc('week') boundaries
        wm.groupBy(window(col("event_time"), "7 days", "7 days", "4 days").as("win")).agg(agg)
          .withColumn("win_start", col("win.start"))
      case "month" | "year" =>
        wm.groupBy(date_trunc(granularity, col("event_time")).as("win_start")).agg(agg)
    }
    aggregated.select(
      lit(s"${granularity}_count").as("Type"),
      unix_timestamp(col("win_start")).as("Timestamp"),
      col("Value"))
  }

  /** All five granularities unioned — one streaming DataFrame in the
    * reference's output shape. */
  def allGranularities(parsed: DataFrame, watermark: String = "10 minutes"): DataFrame =
    graft.core.Buckets.granularities
      .map(g => aggregated(parsed, g, watermark))
      .reduce(_ unionAll _)

  /** Format for the Kafka sink: keyless JSON with capitalized keys,
    * matching `kafkaio.go:92-100` (compact; see [[toSinkFormatPretty]] for
    * the byte-exact variant). */
  def toSinkFormat(stats: DataFrame): DataFrame =
    stats.select(to_json(struct(col("Type"), col("Timestamp"), col("Value"))).as("value"))

  /** Byte-exact replica of the reference's output encoding:
    * `jsoniter.MarshalIndent(msg, "", "  ")` (`kafkaio.go:92`) —
    * pretty-printed, two-space indent, capitalized keys. Built with
    * `format_string` (codegen'd); StatType values never need JSON escaping
    * and Timestamp/Value are integers, so printf is safe here. */
  def toSinkFormatPretty(stats: DataFrame): DataFrame =
    stats.select(format_string(
      "{\n  \"Type\": \"%s\",\n  \"Timestamp\": %d,\n  \"Value\": %d\n}",
      col("Type"), col("Timestamp"), col("Value")).as("value"))

  /** The full wired pipeline against real Kafka — the analogue of the
    * reference's `main()` (`main.go:13-28`). Untested here (no broker in
    * the environment); the parse→aggregate→format stages are covered via
    * MemoryStream in StreamingSpec.
    *
    * `append = true` routes through [[CalendarAppendWindows]]: every
    * granularity (month/year included) emits exactly once per sealed
    * bucket — each output `(Type, Timestamp)` appears once on the stats
    * topic, like the reference. The default update mode re-emits a
    * bucket's running count as it grows (downstream keeps the latest). */
  def run(spark: SparkSession, checkpointDir: String, append: Boolean = false): Unit = {
    val raw = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", KafkaConfig.broker)
      .option("subscribe", KafkaConfig.usersTopic)
      .option("startingOffsets", "earliest") // replay-from-start, README.md:5
      .load()
    val stats =
      if (append) CalendarAppendWindows.allGranularities(spark, parse(raw))
      else allGranularities(parse(raw))
    toSinkFormat(stats).writeStream.format("kafka")
      .option("kafka.bootstrap.servers", KafkaConfig.broker)
      .option("topic", KafkaConfig.statsTopic)
      .option("checkpointLocation", checkpointDir)
      .outputMode(if (append) "append" else "update")
      .start()
    spark.streams.awaitAnyTermination()
  }
}
