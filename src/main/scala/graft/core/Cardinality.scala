package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distinct-user counting per time bucket — the core capability of the
  * reference (`/root/reference/processor/processor.go:79-102`: per-granularity
  * event-time windows over an HLL sketch, < 1% error, `README.md:4`).
  *
  * Three tiers (SURVEY.md §2.2):
  *  - exact: `count(distinct)` — oracle-matchable against DuckDB;
  *  - approx: `approx_count_distinct(rsd = 0.0081)` — Spark's HLL++ with
  *    2^14 registers, the same register count as the reference's
  *    axiomhq/hyperloglog default (p=14, ≈0.81% rse, `go.mod:6`);
  *  - sketch: `hll_sketch_agg(lgK = 14)` — mergeable DataSketches HLL.
  *    Mergeability is the distributed analogue of the reference's single
  *    in-process sketch: partial sketches per partition union at finalize,
  *    and minute-level sketches roll up to coarser granularities WITHOUT
  *    rescanning the input — something the reference's 5 independent
  *    sketches cannot do.
  *
  * Scale notes: each variant is a single hash-partitioned aggregation with
  * map-side partial aggregation; no join, no broadcast, no skew risk beyond
  * bucket-count skew (buckets are time-uniform). At 100 TB the sketch tier
  * is the right default — fixed 16 KiB state per (bucket) group regardless
  * of cardinality, and one scan serves all five granularities via rollup.
  */
object Cardinality {

  /** rsd 0.0081 ⇒ HLL++ p=14 — matches the reference sketch's register
    * count (BASELINE.md: 1.04/sqrt(2^14) ≈ 0.81%). */
  val ReferenceRsd = 0.0081
  /** DataSketches lgK matching the reference's p=14. */
  val ReferenceLgK = 14

  /** Exact distinct `id`s per calendar bucket of granularity `g`. */
  def exactPerBucket(df: DataFrame, g: String, ts: Column, id: Column): DataFrame =
    df.groupBy(Buckets.bucketStart(g, ts).as("bucket"))
      .agg(countDistinct(id).as("n_users"))

  /** Approximate twin of [[exactPerBucket]] (HLL++, p=14). For COARSE
    * granularities (few buckets, many users each) — HLL++ buffers are
    * dense (~22 KB per group at p=14), so fine-grained buckets should use
    * [[approxPerBucketSketch]] instead. */
  def approxPerBucket(df: DataFrame, g: String, ts: Column, id: Column): DataFrame =
    df.groupBy(Buckets.bucketStart(g, ts).as("bucket"))
      .agg(approx_count_distinct(id, ReferenceRsd).as("n_users_approx"))

  /** Approximate distinct per bucket via DataSketches HLL (lgK=14 — same
    * register count): sketches stay SPARSE for low-cardinality groups, so
    * ~39k minute buckets at sf0.1 cost KBs, not GBs, of aggregation buffer
    * (measured 5.3 s → ~1 s vs [[approxPerBucket]]). The right default for
    * fine-grained buckets at 100 TB. */
  def approxPerBucketSketch(df: DataFrame, g: String, ts: Column, id: Column): DataFrame =
    df.groupBy(Buckets.bucketStart(g, ts).as("bucket"))
      .agg(hll_sketch_estimate(
        hll_sketch_agg(id.cast("string"), lit(ReferenceLgK))).as("n_users_approx"))

  /** The reference's full output surface in one query: for all five
    * granularities, `(Type, Timestamp, Value)` rows — the batch analogue of
    * the 5-way fan-out + aggregate (`processor.go:67-74` O3 + O4, output
    * shape `processor.go:18-22`).
    *
    * One `explode` (5× row expansion) into one shuffled aggregation;
    * map-side partial aggregation keeps the shuffle proportional to the
    * number of (granularity, bucket, id) combinations, not input rows.
    */
  def statsAllGranularities(df: DataFrame, ts: Column, id: Column): DataFrame = {
    val buckets = array(Buckets.granularities.map { g =>
      struct(
        lit(Buckets.label(g)).as("Type"),
        Buckets.bucketStart(g, ts).as("Timestamp"))
    }: _*)
    df.select(id.as("uid"), explode(buckets).as("g"))
      .groupBy(col("g.Type").as("Type"), col("g.Timestamp").as("Timestamp"))
      .agg(countDistinct(col("uid")).as("Value"))
  }

  /** Scale path: build ONE minute-level sketch pass, then roll the minute
    * sketches up to every coarser granularity with `hll_union_agg` —
    * 1 input scan + 1 wide shuffle at minute grain, then tiny sketch-only
    * re-aggregations. Returns `(Type, Timestamp, Value)` with estimated
    * counts for all five granularities.
    */
  def sketchRollup(df: DataFrame, ts: Column, id: Column): DataFrame = {
    val minuteSketches = df
      .groupBy(date_trunc("minute", ts).as("minute_start"))
      .agg(hll_sketch_agg(id.cast("string"), lit(ReferenceLgK)).as("sketch"))
    // Grouping-sets-style single pass: explode each minute sketch into its
    // 5 (granularity, bucket) target rows, then ONE sketch-union
    // aggregation — replaces the round-1 cache + 5 re-aggregation passes
    // (same results, one shuffle of small sparse sketches instead of five).
    val targets = array(Buckets.granularities.map { g =>
      struct(
        lit(Buckets.label(g)).as("Type"),
        Buckets.bucketStart(g, col("minute_start")).as("Timestamp"))
    }: _*)
    minuteSketches.select(explode(targets).as("g"), col("sketch"))
      .groupBy(col("g.Type").as("Type"), col("g.Timestamp").as("Timestamp"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(true))).as("Value"))
  }
}
