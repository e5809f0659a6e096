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
      // Normalize `ts` to session-zoned TimestampType whatever the
      // driver's generator emitted — the physical type has changed across
      // testdata regenerations:
      //  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it
      //    (PARQUET_TYPE_ILLEGAL), so read nanos as LongType and convert
      //    with exact integer division — ns epochs (~1.7e18) exceed 2^53,
      //    so a double divide would corrupt the low bits;
      //  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
      //    TIMESTAMP_NTZ, whose rows surface as LocalDateTime and break
      //    java.sql.Timestamp consumers; cast to TimestampType — the
      //    session zone is UTC repo-wide, so wall-clock values (and every
      //    bucket/oracle comparison) are unchanged;
      //  - plain TimestampType passes through.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
