package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Buckets, Cardinality}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 gets a `queries` entry; every
  * SQL-expressible one also gets a DuckDB `oracleSql` twin with IDENTICAL
  * output column names (the driver's compare sorts columns by name).
  * Approximate/sketch/ANN operators are rows-only checked here and
  * bound-property-tested in ScalaTest instead (SURVEY.md §5).
  */
object SparkEntry {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's whole output surface: distinct users per
    * minute/day/week/month/year (processor.go O3+O4). */
  def entry(spark: SparkSession): DataFrame =
    Cardinality.statsAllGranularities(
      events(spark, "/root/testdata/sf0.001"), col("ts"), col("user_id"))

  // ---------------------------------------------------------------------
  // Cardinality core (reference parity)
  // ---------------------------------------------------------------------

  private val cardinalityQueries: Map[String, (SparkSession, String) => DataFrame] =
    Buckets.granularities.map { g =>
      s"q_card_$g" -> ((s: SparkSession, dir: String) =>
        Cardinality.exactPerBucket(events(s, dir), g, col("ts"), col("user_id")))
    }.toMap ++ Map(
      "q_card_stats_all" -> ((s: SparkSession, dir: String) =>
        Cardinality.statsAllGranularities(events(s, dir), col("ts"), col("user_id"))),
      // fine buckets -> sparse DataSketches; coarse buckets -> HLL++
      "q_card_minute_approx" -> ((s: SparkSession, dir: String) =>
        Cardinality.approxPerBucketSketch(events(s, dir), "minute", col("ts"), col("user_id"))),
      "q_card_day_approx" -> ((s: SparkSession, dir: String) =>
        Cardinality.approxPerBucket(events(s, dir), "day", col("ts"), col("user_id"))),
      "q_card_sketch_rollup" -> ((s: SparkSession, dir: String) =>
        Cardinality.sketchRollup(events(s, dir), col("ts"), col("user_id"))),
      // native TypedImperativeAggregate HLL via SQL (GraftExtensions path)
      "q_card_hll_native" -> ((s: SparkSession, dir: String) => {
        s.sessionState.functionRegistry.createOrReplaceTempFunction(
          "hll_distinct_native",
          exprs => graft.functions.expressions.HllDistinctAgg(exprs.head).toAggregateExpression(),
          "built-in")
        events(s, dir)
          .groupBy(Buckets.bucketStart("day", col("ts")).as("bucket"))
          .agg(expr("hll_distinct_native(CAST(user_id AS STRING))").as("n_users_hll"))
      }),
      // custom HLL Aggregator (graft.functions.Hll) per day bucket
      "q_card_hll_udaf" -> ((s: SparkSession, dir: String) => {
        s.udf.register("hll_distinct", udaf(new graft.functions.HllAggregator))
        events(s, dir)
          .groupBy(Buckets.bucketStart("day", col("ts")).as("bucket"))
          .agg(expr("hll_distinct(CAST(user_id AS STRING))").as("n_users_hll"))
      }),
      // exact-semantics tier: the reference's data-driven windows, replayed
      // in batch over events (SURVEY.md §2.1; parity-tested in StreamingSpec)
      "q_stream_data_driven" -> ((s: SparkSession, dir: String) => {
        import s.implicits._
        graft.streaming.DataDrivenWindows.batch(s,
          events(s, dir).select(
            col("user_id").cast("string").as("uid"),
            unix_timestamp(col("ts")).as("ts")).as[graft.streaming.UserMsg]).toDF()
      }),
      // exact-count twin with deterministic (ts, uid) ordering: the
      // reference's data-driven flush semantics under the DuckDB hash gate
      "q_stream_data_driven_exact" -> ((s: SparkSession, dir: String) => {
        import s.implicits._
        graft.streaming.DataDrivenWindows.batchExact(s,
          events(s, dir).select(
            col("user_id").cast("string").as("uid"),
            unix_timestamp(col("ts")).as("ts")).as[graft.streaming.UserMsg]).toDF()
      })
    )

  private val cardinalityOracles: Map[String, String] =
    Buckets.granularities.map { g =>
      s"q_card_$g" ->
        s"""SELECT ${Buckets.bucketStartSql(g, "ts")} AS bucket, count(DISTINCT user_id) AS n_users FROM events GROUP BY 1"""
    }.toMap ++ Map(
      "q_card_stats_all" -> Buckets.granularities.map { g =>
        s"""SELECT '${Buckets.label(g)}' AS "Type", ${Buckets.bucketStartSql(g, "ts")} AS "Timestamp", count(DISTINCT user_id) AS "Value" FROM events GROUP BY 1, 2"""
      }.mkString(" UNION ALL "),
      "q_stream_data_driven_exact" -> graft.streaming.DataDrivenWindows.batchExactSql,
      // Round 10: the DataSketches tiers join the hash gate on their
      // SMALL-RANGE EXACTNESS contract. An HllSketch at lgK=14 stays in
      // its coupon (LIST/SET) modes far beyond this corpus's cardinality
      // — the gate events table carries ≤150 distinct users TOTAL (≤4 per
      // minute bucket), orders of magnitude under the mode transition —
      // and coupon estimates at n ≪ coupon-space are integer-exact, so
      // the true distinct count IS the sketch's answer (verified: 0
      // mismatches over 8 961 + 8 998 rows before registering). If a
      // future testdata regen multiplies user cardinality ~30×+ these two
      // hash gates will fail by the ESTIMATION regime beginning — that is
      // a contract boundary, not an algorithm bug: demote them back to
      // rows-only (CardinalitySpec's 5×-rsd bound remains their law).
      "q_card_minute_approx" ->
        s"""SELECT ${Buckets.bucketStartSql("minute", "ts")} AS bucket, count(DISTINCT user_id) AS n_users_approx FROM events GROUP BY 1""",
      "q_card_sketch_rollup" -> Buckets.granularities.map { g =>
        s"""SELECT '${Buckets.label(g)}' AS "Type", ${Buckets.bucketStartSql(g, "ts")} AS "Timestamp", count(DISTINCT user_id) AS "Value" FROM events GROUP BY 1, 2"""
      }.mkString(" UNION ALL ")
    )

  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    cardinalityQueries ++
      graft.operators.Relational.queries ++
      graft.operators.Temporal.queries ++
      graft.operators.Skew.queries ++
      graft.operators.TextAnalysis.queries ++
      graft.operators.QualityModel.queries ++
      graft.operators.Selection.queries ++
      graft.operators.Bpe.queries ++
      graft.operators.Dedup.queries ++
      graft.operators.Similarity.queries ++
      graft.operators.Sampling.queries ++
      graft.operators.Curation.queries ++
      graft.multimodal.Multimodal.queries

  def oracleSql: Map[String, String] =
    cardinalityOracles ++
      graft.operators.Relational.oracles ++
      graft.operators.Temporal.oracles ++
      graft.operators.Skew.oracles ++
      graft.operators.TextAnalysis.oracles ++
      graft.operators.QualityModel.oracles ++
      graft.operators.Selection.oracles ++
      graft.operators.Bpe.oracles ++
      graft.operators.Dedup.oracles ++
      graft.operators.Similarity.oracles ++
      graft.operators.Sampling.oracles ++
      graft.operators.Curation.oracles ++
      graft.multimodal.Multimodal.oracles
}
