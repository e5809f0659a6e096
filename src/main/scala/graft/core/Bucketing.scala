package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: the pre-shuffle co-location technique for
  * repeated large-⋈-large joins.
  *
  * At 100 TB a lineitem⋈orders join shuffles both sides on every query.
  * Writing both tables bucketed (+sorted) by the join key once moves that
  * shuffle to write time: subsequent joins read co-located buckets and the
  * Exchange disappears from the plan entirely (asserted in
  * BucketedJoinSpec). The same layout serves aggregations on the bucket
  * key. Bucket count should be sized so each bucket ⋈ bucket fits in
  * executor memory at the target SF.
  */
object Bucketing {

  /** Persist `df` bucketed and sorted by `key` as a managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)

  /** Join two tables previously written with [[writeBucketed]] on their
    * common bucket key. With equal bucket counts Catalyst plans a
    * SortMergeJoin with NO Exchange on either side. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
