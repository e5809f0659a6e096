package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * code runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1+ (bench). At
  * cluster scale the same reader works on a partitioned directory tree —
  * parquet scans get column pruning + predicate pushdown from Catalyst.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // The driver's events.ts is parquet TIMESTAMP(NANOS) which Spark's
      // vectorized reader rejects (PARQUET_TYPE_ILLEGAL). Read nanos as
      // LongType and convert to TimestampType (µs) with exact integer
      // division — ns epochs (~1.7e18) exceed 2^53, so a double divide
      // would corrupt the low bits. Events tables that already carry a
      // real timestamp column (e.g. re-written copies) pass through.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
